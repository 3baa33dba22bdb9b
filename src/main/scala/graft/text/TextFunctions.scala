package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/**
 * Text-analysis kernels for large-scale training-data pipelines: tokenization,
 * word shingles, quality signals, language identification and document
 * fingerprinting.
 *
 * Everything here is pure Column algebra over Spark built-ins (codegen'd, no
 * UDFs): at 100 TB these run inside whole-stage codegen next to the parquet
 * scan, with column pruning and predicate pushdown intact.
 */
object TextFunctions {

  /** Unicode-aware default token pattern. */
  val UnicodeTokenPattern = "[^\\p{L}\\p{N}]+"

  /** ASCII token pattern (use when an external oracle must re-derive tokens). */
  val AsciiTokenPattern = "[^a-z0-9]+"

  /** Unicode canonicalization: NFC compose + control-char strip + whitespace
    * collapse + trim, one codegen'd kernel pass. Run BEFORE fingerprints,
    * shingles, or tokenization so byte-level noise (decomposed accents,
    * stray controls, ragged whitespace) can't split duplicate documents.
    * Exactly replicable by any engine with NFC + regex (the oracle does). */
  def canonicalizeText(c: Column): Column = graft.functions.vectors.canonicalize_text(c)

  /** Accent folding (NFD, drop combining marks, NFC) — run before
    * fingerprints/shingles when diacritic variants should dedup together. */
  def foldAccents(c: Column): Column = graft.functions.vectors.fold_accents(c)

  /** Lowercase tokens of `c`, split on `pattern`, empties removed. The ASCII
    * pattern routes to a single-pass codegen'd kernel (identical tokens, no
    * regex, no interpreted HOF) — the hot path for corpus-scale scans. */
  def tokenize(c: Column, pattern: String = UnicodeTokenPattern): Column =
    if (pattern == AsciiTokenPattern) graft.functions.vectors.tokenize_ascii(c)
    else filter(split(lower(c), pattern), t => length(t) > 0)

  /** Distinct word `n`-grams (shingles) joined by single spaces.
    * Empty array when there are fewer than `n` tokens (guarded: Spark's
    * `sequence(1, x)` would count *down* for x < 1). */
  def wordShingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n))))))

  /** Shingles straight from raw text (ASCII tokens, for oracle parity). */
  def textShingles(c: Column, n: Int): Column =
    wordShingles(tokenize(c, AsciiTokenPattern), n)

  /**
   * Distinct *hashed* word n-grams: each shingle becomes its xxhash64
   * fingerprint without materializing the joined string. Set operations on
   * longs are far cheaper than on strings — the preferred representation for
   * dedup at scale (hash collisions at 2^-64 are negligible for set-size
   * arithmetic like Jaccard).
   */
  def hashedShingles(tokens: Column, n: Int): Column =
    when(size(tokens) < n, array().cast(ArrayType(LongType)))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => xxhash64(slice(tokens, i, lit(n))))))

  /** Hashed shingles straight from raw text: delegates to the single-pass
    * codegen'd kernel (HOF lambdas are interpreted; the kernel streams the
    * document bytes once). Token/shingle identity matches [[textShingles]]. */
  def hashedTextShingles(c: Column, n: Int): Column =
    graft.functions.vectors.hashed_word_shingles(c, n)

  /** Number of tokens. */
  def tokenCount(c: Column, pattern: String = UnicodeTokenPattern): Column =
    size(tokenize(c, pattern))

  /** GPT-2-flavored subword-ish segmentation pattern (public BPE pre-tokenizer
    * shape, without the lookahead so it stays portable): contractions, then
    * space-prefixed letter/digit/symbol runs, then whitespace runs. */
  val BpeLikePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Approximate BPE token count: number of pre-tokenizer segments. A cheap,
    * deterministic stand-in for an actual BPE vocabulary (none available
    * here) — correlates with real token counts for budgeting/filtering. */
  def approxBpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpeLikePattern), lit(0)))

  /** Jaccard similarity of two string arrays (0.0 when both empty). */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(array_union(a, b))
    when(union === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / union.cast("double"))
  }

  // --------------------------------------------------------------------------
  // Quality signals
  // --------------------------------------------------------------------------

  /** Mean token length (0.0 for empty docs). */
  def avgTokenLength(tokens: Column): Column =
    when(size(tokens) === 0, lit(0.0))
      .otherwise(
        aggregate(tokens, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(tokens).cast("double"))

  /** Fraction of tokens found in `words` (distinct-insensitive: counts every
    * occurrence). 0.0 for empty docs. */
  def wordSetRatio(tokens: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    when(size(tokens) === 0, lit(0.0))
      .otherwise(
        size(filter(tokens, t => array_contains(set, t))).cast("double") /
          size(tokens).cast("double"))
  }

  /** English stopwords used by [[stopwordRatio]] and [[qualityScore]]. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  def stopwordRatio(tokens: Column): Column = wordSetRatio(tokens, EnglishStopwords)

  /** Fused single-pass token statistics over ASCII tokens:
    * `array<long> [n_tokens, distinct_tokens, total_token_chars, stopword_count]`.
    * Codegen'd kernel — the corpus-scan path for quality stats; the
    * HOF-based [[avgTokenLength]]/[[stopwordRatio]] are per-element
    * interpreted and only appropriate on pre-tokenized columns. */
  def tokenStatsAscii(c: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    graft.functions.vectors.token_stats(c, stopwords)

  /** One-pass Flesch counters `[n_words, n_sentences, n_syllable_groups]`
    * (codegen'd kernel; exact regex-replayable rules — see
    * [[graft.functions.VectorKernels.readabilityStats]]). */
  def readabilityStats(c: Column): Column =
    graft.functions.vectors.readability_stats(c)

  /** Flesch reading ease from the one-pass counters:
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)`; 0.0 for
    * wordless text. Exact long counts into one fixed IEEE expression, so
    * any engine replaying the counting rules reproduces the score
    * bit-for-bit. Typical English prose lands 30–80; gibberish and
    * boilerplate drift far outside — a standard cheap quality signal. */
  def fleschScore(c: Column): Column = {
    val s = readabilityStats(c)
    val w = org.apache.spark.sql.functions.get(s, lit(0)).cast("double")
    val sen = org.apache.spark.sql.functions.get(s, lit(1)).cast("double")
    val syl = org.apache.spark.sql.functions.get(s, lit(2)).cast("double")
    when(w === 0.0, lit(0.0))
      .otherwise(lit(206.835) - lit(1.015) * (w / sen) - lit(84.6) * (syl / w))
  }

  /** Ratio of non-alphanumeric, non-whitespace chars to all chars (0 for empty). */
  def punctuationRatio(c: Column): Column = {
    val total = length(c)
    when(total === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[\\p{L}\\p{N}\\s]", "")).cast("double") / total.cast("double"))
  }

  /** Ratio of digit chars to all chars (0 for empty). */
  def digitRatio(c: Column): Column = {
    val total = length(c)
    when(total === 0, lit(0.0))
      .otherwise(length(regexp_replace(c, "[^0-9]", "")).cast("double") / total.cast("double"))
  }

  /**
   * Heuristic quality score in [0, 1]; higher = more natural-language-like.
   * Deterministic linear blend (documented so external oracles can mirror it):
   * 0.4 * min(tokenCount, 100)/100 + 0.3 * min(stopwordRatio * 5, 1)
   * + 0.3 * (1 - min(punctuationRatio * 4, 1)).
   */
  def qualityScore(c: Column, pattern: String = UnicodeTokenPattern): Column = {
    val toks = tokenize(c, pattern)
    val lengthTerm = least(size(toks).cast("double") / 100.0, lit(1.0))
    val stopTerm = least(stopwordRatio(toks) * 5.0, lit(1.0))
    val punctTerm = lit(1.0) - least(punctuationRatio(c) * 4.0, lit(1.0))
    lengthTerm * 0.4 + stopTerm * 0.3 + punctTerm * 0.3
  }

  // --------------------------------------------------------------------------
  // Repetition signals & chunking
  // --------------------------------------------------------------------------

  /** Fused n-gram repetition statistics over ASCII tokens:
    * `array<long> [totalNgrams, topNgramCount]` (total occurrences with
    * repeats; occurrences of the single most frequent n-gram). Codegen'd
    * single-pass kernel — the corpus-scan path for repetition filtering. */
  def topNgramStats(c: Column, n: Int): Column =
    graft.functions.vectors.top_ngram_stats(c, n)

  /** Fraction of n-gram occurrences taken by the most frequent n-gram — a
    * repetition quality signal (boilerplate and degenerate docs score high;
    * see the Gopher paper's repetition filters). 0.0 for docs with fewer than
    * `n` tokens. */
  def topNgramFraction(c: Column, n: Int): Column = {
    val s = topNgramStats(c, n)
    val total = get(s, lit(0))
    when(total === 0, lit(0.0))
      .otherwise(get(s, lit(1)).cast("double") / total.cast("double"))
  }

  /** Overlapping token-window chunks of the document, re-joined by single
    * spaces: chunk `i` covers tokens `[i*stride, i*stride+chunkSize)`,
    * `stride = chunkSize - overlap`. Single codegen'd pass per document. */
  def chunkTokens(c: Column, chunkSize: Int, overlap: Int = 0): Column = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got overlap=$overlap chunkSize=$chunkSize")
    graft.functions.vectors.chunk_tokens(c, chunkSize, chunkSize - overlap)
  }

  /** Explode documents into overlapping token-window chunks for training-data
    * preparation: one output row per chunk, `(idCols..., chunk_index,
    * chunk_text)`. Narrow (no shuffle): chunking runs inside whole-stage
    * codegen next to the scan, and the explode multiplies rows
    * partition-locally — at 100 TB the output partitioning simply inherits
    * the input's. */
  def chunkByTokens(
      df: org.apache.spark.sql.DataFrame, text: Column,
      chunkSize: Int, overlap: Int, idCols: Column*): org.apache.spark.sql.DataFrame =
    df.select(idCols :+
      posexplode(chunkTokens(text, chunkSize, overlap)).as(Seq("chunk_index", "chunk_text")): _*)

  // --------------------------------------------------------------------------
  // Language identification (marker-word heuristic)
  // --------------------------------------------------------------------------

  /** Marker words per language, ordered by tie-break priority. */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "fr" -> Seq("le", "la", "les", "des", "et", "une", "est", "que", "pour", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "auf"),
    "es" -> Seq("el", "los", "las", "una", "es", "que", "por", "para", "como", "pero"))

  /** Distinct-token overlap with each language's marker set; prediction is the
    * argmax with ties resolved in [[LanguageMarkers]] order; "und" (undefined)
    * when no marker matches at all. */
  def langId(c: Column, pattern: String = UnicodeTokenPattern): Column = {
    val toks = array_distinct(tokenize(c, pattern))
    val scores = LanguageMarkers.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    val first = struct(scores.head._2.as("s"), lit(scores.head._1).as("l"))
    val best = scores.tail.foldLeft(first) { case (acc, (lang, s)) =>
      when(s > acc.getField("s"), struct(s.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(best.getField("s") === 0, lit("und")).otherwise(best.getField("l"))
  }

  // --------------------------------------------------------------------------
  // Fingerprinting
  // --------------------------------------------------------------------------

  /** Whitespace-normalized, lowercased text (for fingerprinting / exact dedup). */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** MD5 hex fingerprint of the normalized text — stable across engines, so an
    * external oracle (DuckDB md5()) reproduces it exactly. */
  def fingerprintMd5(c: Column): Column = md5(normalizeText(c))

  /** 64-bit fingerprint of the normalized text (xxhash64; cheap, Spark-only). */
  def fingerprint64(c: Column): Column = xxhash64(normalizeText(c))
}
