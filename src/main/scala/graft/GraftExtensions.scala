package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Expression, ExpressionInfo,
  LessThan, Literal, Md5, RegExpReplace, Substring}
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.functions.{CanonicalizeText, ChunkTokens, CosineSimilarity, DeflateLength, Dehyphenate, FoldAccents,
  DeletionVariants, DotProduct, HashedWordShingles, MinHashBandHashes, MinHashSignature,
  JaroWinklerFp, MaskPatterns, MatchedPatterns, RedactValidCards, ScriptProfile, SimHash64,
  Soundex4, TokenStats, TokenizeAscii, TopNgramStats, ValidCardCount, WinnowedShingles,
  WordShingles, WordShinglesAll}
import graft.multimodal.{ByteEntropy, ByteNibbleHistogram, ImageDimsExpr, VideoInfoExpr, WavInfoExpr}
import graft.sample.Sampling
import graft.text.Redact

/**
 * SQL registration for the graft Catalyst kernels, so `spark.sql("...")`
 * users get the same codegen'd expressions as the Scala/Python APIs:
 *
 *   - config-based, before session build:
 *       `--conf spark.sql.extensions=graft.GraftExtensions`
 *   - programmatic, on a live session:
 *       `graft.GraftExtensions.registerAll(spark)`
 *
 * Non-column arguments (n, bands, chunk sizes) must be integer literals —
 * they parameterize the generated code and cannot vary per row.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // tier (c): transparent file skipping — Bloom sidecar for equality/IN
    // (opt-in via spark.graft.bloomSkip.enabled=true) and footer zone
    // maps for ranges (opt-in via spark.graft.zoneSkip.enabled=true);
    // both rules are no-ops until their conf is set, so injecting the
    // extensions costs existing queries nothing
    ext.injectOptimizerRule(_ => graft.plans.BloomSkipRule)
    ext.injectOptimizerRule(_ => graft.plans.ZoneSkipRule)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer, got $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got $other")
    }
  }

  private def stringLits(es: Seq[Expression], fn: String): Seq[String] =
    es.map { e =>
      require(e.foldable, s"$fn: stopwords must be string literals")
      String.valueOf(e.eval())
    }

  private def stringLit(e: Expression, fn: String, arg: String): String = {
    require(e.foldable, s"$fn: $arg must be a string literal, got $e")
    String.valueOf(e.eval())
  }

  private def doubleLit(e: Expression, fn: String, arg: String): Double = {
    require(e.foldable, s"$fn: $arg must be a numeric literal, got $e")
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a numeric literal, got $other")
    }
  }

  private def arity(fn: String, es: Seq[Expression], expected: Int*): Unit =
    require(expected.contains(es.length),
      s"$fn expects ${expected.mkString(" or ")} arguments, got ${es.length}")

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.GraftExtensions", null, name, usage, ""),
      builder)

  /** Saved tokenizer models loaded inside SQL function builders, cached by
    * (kind, path) under a listStatus signature of the artifact directory —
    * a retrained/re-saved model invalidates, re-analysis of the same query
    * hits the cache (the BloomSkip sidecar discipline). Builders run at
    * ANALYSIS time, so the load is one bounded driver read per distinct
    * model, never per row. */
  private val ModelCacheCap = 64
  private val modelCache =
    new java.util.LinkedHashMap[String, (String, Any)](16, 0.75f, true) {
      // LRU-bounded: a driver that retrains to fresh timestamped paths
      // (or serves many tenants) must not grow the heap without bound
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Any)]): Boolean =
        size() > ModelCacheCap
    }

  private def loadCachedModel[A](kind: String, path: String)
                                (load: SparkSession => A): A = {
    val spark = SparkSession.active
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"${kind}_encode_model: no model at $path")
    val sig = graft.parquet.SidecarFiles.signature(spark, path)
    val key = s"$kind|$path"
    modelCache.synchronized {
      val cached = modelCache.get(key)
      if (cached != null && cached._1 == sig) return cached._2.asInstanceOf[A]
    }
    val m = load(spark)
    modelCache.synchronized { modelCache.put(key, (sig, m)) }
    m
  }

  /** All SQL-registrable kernels: name, doc, builder. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("tokenize_ascii", "tokenize_ascii(text) - lowercased [a-z0-9] tokens") { es =>
      arity("tokenize_ascii", es, 1); TokenizeAscii(es.head)
    },
    // saved-artifact tokenizer encodes: path must be a string literal; the
    // model loads once at analysis (cached) and ships as a kernel reference
    fn("bpe_encode_model",
      "bpe_encode_model(path, text) - BPE merge-replay subword stream under the model saved at path") { es =>
      arity("bpe_encode_model", es, 2)
      val path = stringLit(es.head, "bpe_encode_model", "path")
      val m = loadCachedModel("bpe", path)(sp => graft.text.Bpe.loadBpe(sp, path))
      graft.functions.BpeEncodeTokens(es(1), m.merges)
    },
    fn("byte_bpe_encode_model",
      "byte_bpe_encode_model(path, text) - byte-level BPE token stream " +
        "(GPT-2 display alphabet) under the model saved at path") { es =>
      arity("byte_bpe_encode_model", es, 2)
      val path = stringLit(es.head, "byte_bpe_encode_model", "path")
      val m = loadCachedModel("byte_bpe", path)(sp =>
        graft.text.ByteBpe.loadByteBpe(sp, path))
      graft.functions.ByteBpeEncode(es(1), m.merges)
    },
    fn("wordpiece_encode_model",
      "wordpiece_encode_model(path, text) - greedy longest-match subword stream under the model saved at path") { es =>
      arity("wordpiece_encode_model", es, 2)
      val path = stringLit(es.head, "wordpiece_encode_model", "path")
      val m = loadCachedModel("wordpiece", path)(sp =>
        graft.text.WordPiece.loadWordPiece(sp, path))
      graft.functions.WordPieceEncode(es(1), m.pieces)
    },
    fn("unigram_encode_model",
      "unigram_encode_model(path, text) - Viterbi globally-best subword stream under the model saved at path") { es =>
      arity("unigram_encode_model", es, 2)
      val path = stringLit(es.head, "unigram_encode_model", "path")
      val m = loadCachedModel("unigram", path)(sp =>
        graft.text.Unigram.loadUnigram(sp, path))
      graft.functions.UnigramEncode(es(1), m.pieces, m.scores)
    },
    fn("byte_bpe_encode_ids_model",
      "byte_bpe_encode_ids_model(path, text) - byte-level BPE token-ID " +
        "stream (array<int>; GPT-2 vocab: ids 0..255 = bytes, 256+i = " +
        "merge i) under the model saved at path") { es =>
      arity("byte_bpe_encode_ids_model", es, 2)
      val path = stringLit(es.head, "byte_bpe_encode_ids_model", "path")
      val m = loadCachedModel("byte_bpe", path)(sp =>
        graft.text.ByteBpe.loadByteBpe(sp, path))
      graft.functions.ByteBpeEncodeIds(es(1), m.merges)
    },
    fn("byte_bpe_decode_ids_model",
      "byte_bpe_decode_ids_model(path, ids) - exact-inverse detokenizer " +
        "for byte-BPE token-ID streams under the model saved at path") { es =>
      arity("byte_bpe_decode_ids_model", es, 2)
      val path = stringLit(es.head, "byte_bpe_decode_ids_model", "path")
      val m = loadCachedModel("byte_bpe", path)(sp =>
        graft.text.ByteBpe.loadByteBpe(sp, path))
      graft.functions.ByteBpeDecodeIds(es(1), m.merges)
    },
    fn("byte_bpe_decode",
      "byte_bpe_decode(tokens) - exact-inverse byte-level-BPE detokenizer: " +
        "display tokens -> bytes -> UTF-8 text (model-free; " +
        "byte_bpe_decode(byte_bpe_encode_model(p, x)) = x)") { es =>
      arity("byte_bpe_decode", es, 1)
      graft.functions.ByteBpeDecode(es.head)
    },
    fn("dehyphenate",
      "dehyphenate(text) - rejoin words hyphen-split across line breaks " +
        "(lowercase continuation only; dashes/uppercase/digits preserved)") { es =>
      arity("dehyphenate", es, 1); Dehyphenate(es.head)
    },
    fn("fold_accents",
      "fold_accents(text) - NFD, drop combining marks, NFC recompose") { es =>
      arity("fold_accents", es, 1); FoldAccents(es.head)
    },
    fn("redact_valid_cards",
      "redact_valid_cards(text[, token]) - replace Luhn-valid 13..19-digit " +
        "card runs (single space/dash group separators) with token; " +
        "checksum-failing runs pass through") { es =>
      arity("redact_valid_cards", es, 1, 2)
      val token =
        if (es.length == 2) stringLit(es(1), "redact_valid_cards", "token")
        else "[CARD]"
      RedactValidCards(es.head, token)
    },
    fn("valid_card_count",
      "valid_card_count(text) - number of Luhn-valid card runs") { es =>
      arity("valid_card_count", es, 1); ValidCardCount(es.head)
    },
    fn("soundex4",
      "soundex4(text) - 4-char American Soundex phonetic code " +
        "('0000' when no ASCII letter)") { es =>
      arity("soundex4", es, 1); Soundex4(es.head)
    },
    fn("jaro_winkler_fp",
      "jaro_winkler_fp(a, b) - floor(jaro_winkler(a, b) * 2^20), exact " +
        "integer arithmetic (engine-portable accept/reject)") { es =>
      arity("jaro_winkler_fp", es, 2); JaroWinklerFp(es.head, es(1))
    },
    fn("canonicalize_text",
      "canonicalize_text(text) - NFC + control strip + whitespace collapse + trim") { es =>
      arity("canonicalize_text", es, 1); CanonicalizeText(es.head)
    },
    fn("token_stats",
      "token_stats(text[, stopword, ...]) - [n_tokens, distinct, chars, stopword_count]") { es =>
      arity("token_stats", es, (1 to 32): _*)
      TokenStats(es.head, stringLits(es.tail, "token_stats"))
    },
    fn("top_ngram_stats", "top_ngram_stats(text, n) - [total n-grams, top n-gram count]") { es =>
      arity("top_ngram_stats", es, 2)
      TopNgramStats(es.head, intLit(es(1), "top_ngram_stats", "n"))
    },
    fn("chunk_tokens", "chunk_tokens(text, chunkSize, stride) - token-window chunks") { es =>
      arity("chunk_tokens", es, 3)
      ChunkTokens(es.head, intLit(es(1), "chunk_tokens", "chunkSize"),
        intLit(es(2), "chunk_tokens", "stride"))
    },
    fn("hashed_word_shingles", "hashed_word_shingles(text, n) - distinct hashed word n-grams") { es =>
      arity("hashed_word_shingles", es, 2)
      HashedWordShingles(es.head, intLit(es(1), "hashed_word_shingles", "n"))
    },
    fn("winnowed_shingles",
      "winnowed_shingles(text, n, w) - MOSS winnowing fingerprint selection: " +
        "distinct window-min hashes of the full n-gram hash sequence") { es =>
      arity("winnowed_shingles", es, 3)
      WinnowedShingles(es.head, intLit(es(1), "winnowed_shingles", "n"),
        intLit(es(2), "winnowed_shingles", "w"))
    },
    fn("word_shingles", "word_shingles(text, n) - distinct word n-grams as strings") { es =>
      arity("word_shingles", es, 2)
      WordShingles(es.head, intLit(es(1), "word_shingles", "n"))
    },
    fn("word_shingles_all",
      "word_shingles_all(text, n) - word n-grams with multiplicity, in order") { es =>
      arity("word_shingles_all", es, 2)
      WordShinglesAll(es.head, intLit(es(1), "word_shingles_all", "n"))
    },
    fn("deletion_variants",
      "deletion_variants(s) - s plus its distinct one-char-deletion variants") { es =>
      arity("deletion_variants", es, 1); DeletionVariants(es.head)
    },
    fn("deflate_length", "deflate_length(text[, level]) - DEFLATE byte length") { es =>
      arity("deflate_length", es, 1, 2)
      DeflateLength(es.head, if (es.length == 2) intLit(es(1), "deflate_length", "level") else 6)
    },
    fn("minhash_signature", "minhash_signature(features, k) - k MinHash values") { es =>
      arity("minhash_signature", es, 2)
      MinHashSignature(es.head, intLit(es(1), "minhash_signature", "k"))
    },
    fn("minhash_band_hashes",
      "minhash_band_hashes(features, bands, rowsPerBand) - LSH band bucket hashes") { es =>
      arity("minhash_band_hashes", es, 3)
      MinHashBandHashes(es.head, intLit(es(1), "minhash_band_hashes", "bands"),
        intLit(es(2), "minhash_band_hashes", "rowsPerBand"))
    },
    fn("simhash64", "simhash64(features) - 64-bit SimHash") { es =>
      arity("simhash64", es, 1); SimHash64(es.head)
    },
    fn("int8_encode", "int8_encode(vec) - symmetric int8 quantization to binary codes") { es =>
      arity("int8_encode", es, 1); graft.functions.Int8Encode(es.head)
    },
    fn("int8_encode_ints", "int8_encode_ints(vec) - int8 codes as array<int>") { es =>
      arity("int8_encode_ints", es, 1); graft.functions.Int8EncodeInts(es.head)
    },
    fn("int8_scale", "int8_scale(vec) - dequantization scale maxabs/127") { es =>
      arity("int8_scale", es, 1); graft.functions.Int8Scale(es.head)
    },
    fn("int8_dot", "int8_dot(a, b) - exact integer dot of int8 code arrays") { es =>
      arity("int8_dot", es, 2); graft.functions.Int8Dot(es.head, es(1))
    },
    fn("bit_sign_pack", "bit_sign_pack(vec) - 1-bit sign quantization to packed 64-bit words") { es =>
      arity("bit_sign_pack", es, 1); graft.functions.BitSignPack(es.head)
    },
    fn("hamming_words", "hamming_words(a, b) - Hamming distance between packed sign codes") { es =>
      arity("hamming_words", es, 2); graft.functions.HammingWords(es.head, es(1))
    },
    fn("int8_decode", "int8_decode(codes, scale) - int8 codes back to array<float>") { es =>
      arity("int8_decode", es, 2); graft.functions.Int8Decode(es.head, es(1))
    },
    fn("cosine_similarity", "cosine_similarity(a, b) - cosine over array<float>") { es =>
      arity("cosine_similarity", es, 2); CosineSimilarity(es.head, es(1))
    },
    fn("dot_product", "dot_product(a, b) - dot product over array<float>") { es =>
      arity("dot_product", es, 2); DotProduct(es.head, es(1))
    },
    fn("matched_patterns",
      "matched_patterns(text, pattern, ...) - distinct ids of patterns occurring verbatim (one Aho-Corasick pass)") { es =>
      arity("matched_patterns", es, (2 to 33): _*)
      MatchedPatterns(es.head, stringLits(es.tail, "matched_patterns"))
    },
    fn("mask_patterns",
      "mask_patterns(text, mask, pattern, ...) - leftmost-longest non-overlapping occurrences replaced by mask (one Aho-Corasick pass)") { es =>
      arity("mask_patterns", es, (3 to 34): _*)
      MaskPatterns(es.head, stringLits(es.drop(2), "mask_patterns"),
        stringLit(es(1), "mask_patterns", "mask"))
    },
    fn("readability_stats",
      "readability_stats(text) - [n_words, n_sentences, n_syllable_groups] Flesch counters in one pass") { es =>
      arity("readability_stats", es, 1); graft.functions.ReadabilityStats(es.head)
    },
    fn("script_profile",
      "script_profile(text) - [total, latin, cyrillic, greek, arabic, cjk, digit] codepoint counts") { es =>
      arity("script_profile", es, 1); ScriptProfile(es.head)
    },
    fn("byte_entropy", "byte_entropy(binary) - Shannon entropy in bits/byte") { es =>
      arity("byte_entropy", es, 1); ByteEntropy(es.head)
    },
    fn("byte_nibble_histogram", "byte_nibble_histogram(binary) - 16 high-nibble counts") { es =>
      arity("byte_nibble_histogram", es, 1); ByteNibbleHistogram(es.head)
    },
    fn("image_dims",
      "image_dims(binary) - struct(format, width, height); null for non-images") { es =>
      arity("image_dims", es, 1); ImageDimsExpr(es.head)
    },
    fn("wav_info",
      "wav_info(binary) - struct(channels, sample_rate, bits_per_sample, n_frames)") { es =>
      arity("wav_info", es, 1); WavInfoExpr(es.head)
    },
    fn("video_info",
      "video_info(binary) - struct(format, width, height, duration_ms, n_frames)") { es =>
      arity("video_info", es, 1); VideoInfoExpr(es.head)
    },
    // curation surface: built from codegen'd built-ins (RegExpReplace /
    // Md5+Substring), same constants as the Scala Redact/Sampling APIs
    fn("redact_pii", "redact_pii(text[, token]) - scrub emails, IPv4, 9+-digit runs") { es =>
      arity("redact_pii", es, 1, 2)
      val token = if (es.length == 2) stringLit(es(1), "redact_pii", "token")
                  else Redact.DefaultToken
      RegExpReplace(es.head, Literal(Redact.PiiPattern), Literal(token), Literal(1))
    },
    fn("decode_numeric_entities",
      "decode_numeric_entities(text) - HTML numeric char refs -> code points " +
        "(whitespace/control/invalid -> space, malformed stay literal)") { es =>
      arity("decode_numeric_entities", es, 1)
      graft.functions.DecodeNumericEntities(es.head)
    },
    fn("cdc_chunks",
      "cdc_chunks(payload[, avgBits, minSize, maxSize]) - content-defined " +
        "chunk ids+sizes (Gear rolling hash, FNV-1a 64 ids)") { es =>
      arity("cdc_chunks", es, 1, 4)
      val avgBits = if (es.length > 1) intLit(es(1), "cdc_chunks", "avgBits")
                    else graft.multimodal.Cdc.DefaultAvgBits
      val minSize = if (es.length > 2) intLit(es(2), "cdc_chunks", "minSize")
                    else graft.multimodal.Cdc.DefaultMinSize
      val maxSize = if (es.length > 3) intLit(es(3), "cdc_chunks", "maxSize")
                    else graft.multimodal.Cdc.DefaultMaxSize
      graft.multimodal.CdcChunks(es.head, avgBits, minSize, maxSize)
    },
    fn("fix_mojibake",
      "fix_mojibake(text) - repair UTF-8-read-as-cp1252 corruption " +
        "('Ã©' -> 'é') to a fixpoint; non-round-tripping text unchanged") { es =>
      arity("fix_mojibake", es, 1)
      graft.functions.FixMojibake(es.head)
    },
    fn("canonicalize_url",
      "canonicalize_url(url) - deterministic URL normalization (scheme/host " +
        "lowercase, www./default-port/fragment/tracking-param drop, sorted query)") { es =>
      arity("canonicalize_url", es, 1)
      graft.functions.UrlKernel(es.head, "canonicalize_url")
    },
    fn("url_host",
      "url_host(url) - canonical host ('' when unparsable)") { es =>
      arity("url_host", es, 1)
      graft.functions.UrlKernel(es.head, "url_host")
    },
    fn("registrable_domain",
      "registrable_domain(url) - registrable-domain heuristic (2 labels, " +
        "3 under known multi-part suffixes)") { es =>
      arity("registrable_domain", es, 1)
      graft.functions.UrlKernel(es.head, "registrable_domain")
    },
    fn("decode_html_entities",
      "decode_html_entities(text) - one-pass named (HTML 4.01 set + apos) " +
        "and numeric char-ref decode; unknown names stay literal") { es =>
      arity("decode_html_entities", es, 1)
      graft.functions.DecodeHtmlEntities(es.head)
    },
    fn("strip_html", "strip_html(text) - HTML-to-text extraction (RE2-safe regex chain)") { es =>
      arity("strip_html", es, 1)
      // the same ordered chain as graft.text.Html.stripHtml, as built-ins
      import graft.text.Html
      val steps: Seq[(String, String)] = Seq(
        Html.ScriptStylePattern -> " ", Html.CommentPattern -> " ",
        Html.TagPattern -> " ", "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&apos;" -> "'", Html.NumericEntityPattern -> " ",
        "&amp;" -> "&", Html.WhitespacePattern -> " ")
      val chained = steps.foldLeft(es.head) { case (acc, (pat, rep)) =>
        RegExpReplace(acc, Literal(pat), Literal(rep), Literal(1))
      }
      org.apache.spark.sql.catalyst.expressions.StringTrim(chained)
    },
    fn("hilbert_index",
      "hilbert_index(lanes, bits) - Hilbert-curve key of pre-quantized " +
        "array<bigint> coordinate lanes (Skilling transform)") { es =>
      arity("hilbert_index", es, 2)
      graft.functions.HilbertIndex(es.head, intLit(es(1), "hilbert_index", "bits"))
    },
    fn("cms_sketch",
      "cms_sketch(key, depth, width) - count-min counter array (md5-bucketed, " +
        "engine-portable; mergeable aggregate)") { es =>
      arity("cms_sketch", es, 3)
      graft.agg.CmsSketchAgg(es.head, intLit(es(1), "cms_sketch", "depth"),
        intLit(es(2), "cms_sketch", "width"))
    },
    fn("cms_estimate",
      "cms_estimate(sketch, key, depth, width) - count-min point query " +
        "(min over rows; estimate >= true count)") { es =>
      arity("cms_estimate", es, 4)
      graft.agg.CmsEstimate(es.head, es(1), intLit(es(2), "cms_estimate", "depth"),
        intLit(es(3), "cms_estimate", "width"))
    },
    fn("bloom_bits",
      "bloom_bits(hash, logBits, k) - fixed-size Bloom bit array over 64-bit " +
        "hashes (mergeable aggregate; pair with xxhash64)") { es =>
      arity("bloom_bits", es, 3)
      graft.parquet.BloomBitsAgg(es.head, intLit(es(1), "bloom_bits", "logBits"),
        intLit(es(2), "bloom_bits", "k"))
    },
    fn("hash_sample_keep",
      "hash_sample_keep(key, rate[, salt]) - deterministic sampling keep-predicate") { es =>
      arity("hash_sample_keep", es, 2, 3)
      val rate = doubleLit(es(1), "hash_sample_keep", "rate")
      val salt = if (es.length == 3) stringLit(es(2), "hash_sample_keep", "salt") else "graft"
      LessThan(
        Substring(
          Md5(Cast(Concat(Seq(Literal(salt), Cast(es.head, StringType))), BinaryType)),
          Literal(1), Literal(8)),
        Literal(Sampling.thresholdHex(rate)))
    })

  /** Register every kernel into a live session's function registry. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
    // live-session path for the optimizer rule (config-based sessions get
    // it through injectOptimizerRule above)
    Seq(graft.plans.BloomSkipRule, graft.plans.ZoneSkipRule).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
  }
}
