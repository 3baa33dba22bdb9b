package graft.text

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Corpus-level frequency reports: the "what is my boilerplate" view that
 * drives line/shingle dedup thresholds and stopword lists.
 */
object CorpusStats {

  /**
   * The `k` word `n`-grams that appear in the most documents, with their
   * document frequencies: `(gram, doc_freq)`, highest first, ties broken by
   * gram text so the result is deterministic.
   *
   * Scale shape: per-document distinct shingles come from the single-pass
   * codegen'd string-shingle kernel (no interpreted HOFs); the count is one
   * hash aggregation on the gram — partial aggregation combines map-side, so
   * a boilerplate gram present in every document sends ONE row per map task
   * into the shuffle, never a row per document (heavy hitters are exactly the
   * grams this report exists to find, and exactly the ones partial
   * aggregation compresses best). The top-k is `orderBy().limit(k)`, which
   * Spark executes as TakeOrderedAndProject: per-partition bounded heaps and
   * a k-row driver merge — no global sort is ever materialized.
   *
   * When the gram TEXT is not needed (thresholding only), count
   * `hashed_word_shingles` instead: the shuffle then carries 8-byte longs.
   */
  def topNgrams(df: DataFrame, text: Column, n: Int, k: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(k >= 1, s"k must be >= 1: $k")
    df.select(explode(vectors.word_shingles(text, n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("gram").asc)
      .limit(k)
  }

  /**
   * Per-document n-gram novelty profile: for each document, how much of its
   * distinct word `n`-gram set also appears in at least `minDocFreq`
   * documents (itself included) — the document-level "duplicate text mass"
   * view that ranks near-boilerplate documents for removal and flags
   * memorization-risk text, without committing to any pairing of documents
   * the way near-dup detection does. Output per input row:
   * `(id, n_grams, dup_grams, dup_fraction)` with `dup_fraction =
   * dup_grams / n_grams` as one IEEE division of two exact longs (NULL when
   * the document has no `n`-gram at all).
   *
   * Set semantics per document (the codegen distinct-shingle kernel):
   * a document repeating its own phrase is NOT novel-penalized — only mass
   * shared ACROSS documents counts, which is what matters for training-data
   * curation.
   *
   * Scale shape: the exploded `(id, gram)` stream feeds a map-side-combining
   * doc-frequency aggregation; the duplicated-gram set (df >= minDocFreq) —
   * for realistic `n` a small fraction of the vocabulary — comes back as a
   * LEFT SEMI join on the gram key, so the second aggregation only carries
   * the duplicated mass; per-doc totals are a narrow `size(kernel)` column
   * that never touches an exchange. With `hashed = true` both exchanges
   * carry 8-byte longs instead of gram text (the production setting; counts
   * are identical absent 64-bit collisions — sbt pins hashed == string on a
   * corpus at this scale).
   */
  def noveltyProfile(df: DataFrame, id: Column, text: Column, n: Int,
                     minDocFreq: Int = 2, hashed: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2: $minDocFreq")
    def shingles(c: Column): Column =
      if (hashed) vectors.hashed_word_shingles(c, n) else vectors.word_shingles(c, n)
    val grams = df.select(id.as("id"), explode(shingles(text)).as("gram"))
    val dupGrams = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocFreq)
      .select(col("gram"))
    val dupPerDoc = grams.join(dupGrams, Seq("gram"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__dup"))
    df.select(id.as("id"), size(shingles(text)).cast("long").as("n_grams"))
      .join(dupPerDoc, Seq("id"), "left")
      .select(
        col("id"), col("n_grams"),
        coalesce(col("__dup"), lit(0L)).as("dup_grams"),
        when(col("n_grams") === 0L, lit(null).cast("double"))
          .otherwise(coalesce(col("__dup"), lit(0L)).cast("double") /
            col("n_grams").cast("double")).as("dup_fraction"))
  }

  /**
   * One-row corpus duplicate-mass report over word `n`-grams: of all
   * per-document distinct `n`-gram occurrences, how many are of grams
   * present in at least `minDocFreq` documents — the corpus-level summary
   * that decides WHETHER a span-dedup pass is worth running before paying
   * for it. Columns: `gram_occurrences` (sum of per-doc distinct grams),
   * `distinct_grams`, `dup_occurrences`, `distinct_dup_grams`, and
   * `dup_mass_fraction` as one IEEE division of two exact longs.
   *
   * Scale shape: ONE map-side-combining aggregation on the gram key
   * produces the vocabulary-sized doc-frequency table, and the report is a
   * single scalar aggregate over it — no join back to the corpus at all,
   * strictly cheaper than [[noveltyProfile]]. `hashed = true` keeps the one
   * real exchange to 8-byte longs.
   */
  def duplicateGramMass(df: DataFrame, text: Column, n: Int,
                        minDocFreq: Int = 2, hashed: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2: $minDocFreq")
    val gram =
      if (hashed) vectors.hashed_word_shingles(text, n) else vectors.word_shingles(text, n)
    df.select(explode(gram).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("__df"))
      .agg(
        sum(col("__df")).as("gram_occurrences"),
        count(lit(1)).as("distinct_grams"),
        sum(when(col("__df") >= minDocFreq, col("__df")).otherwise(0L)).as("dup_occurrences"),
        sum(when(col("__df") >= minDocFreq, 1L).otherwise(0L)).as("distinct_dup_grams"))
      .select(
        col("gram_occurrences"), col("distinct_grams"),
        col("dup_occurrences"), col("distinct_dup_grams"),
        (col("dup_occurrences").cast("double") /
          col("gram_occurrences").cast("double")).as("dup_mass_fraction"))
  }

  /**
   * The `k` most DISTINCTIVE terms of each group (source/domain/language
   * slice): TF-IDF with every number exact, so the ranking is engine-portable
   * and hash-verifiable. Term frequency is the count of group documents
   * containing the term (set semantics, from the same distinct-shingle kernel
   * as [[topNgrams]]); the IDF weight is the integer `floor(log2(N / df))`
   * computed as `length(bin(N / df)) - 1` — BIGINT division then a
   * bit-length, no libm anywhere; `score = tf * idf_bits`. Terms present in
   * most documents score 0 and fall out, which is the point.
   *
   * Scale shape: two hash aggregations over exploded `(group, term)` /
   * `(term)` rows — both combine map-side, so boilerplate terms send one row
   * per map task into each exchange, not one per document. The df table
   * (vocabulary-sized) joins back on the term key as an ordinary shuffled
   * hash join, and the final per-group top-k is a rank filter that Catalyst
   * plans as `WindowGroupLimit` (map-side partial top-k — see
   * [[graft.agg.TopK.topKPerGroup]]). Ordering ties break on term text:
   * total order, deterministic output.
   */
  def tfidfTerms(
      df: DataFrame, group: Column, text: Column, k: Int,
      rankColumn: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val docTerms = df
      .select(group.as("group_key"), explode(vectors.word_shingles(text, 1)).as("term"))
    // corpus cardinality as a broadcast 1-row join: the plan stays lazy,
    // no driver round-trip at construction time
    val nDocs = df.agg(count(lit(1)).cast("long").as("n_docs"))
    val dfCounts = docTerms
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df_docs"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_bits",
        (length(bin(expr("n_docs div df_docs"))) - 1).cast("long"))
      .drop("n_docs")
    val tfCounts = docTerms
      .groupBy(col("group_key"), col("term"))
      .agg(count(lit(1)).as("tf_docs"))
    val scored = tfCounts.join(dfCounts, "term")
      .withColumn("score", col("tf_docs") * col("idf_bits"))
    graft.agg.TopK.topKPerGroup(
      scored.select(
        col("group_key"), col("term"), col("tf_docs"), col("df_docs"), col("score")),
      Seq(col("group_key")),
      Seq(col("score").desc, col("term").asc),
      k, rankColumn)
  }

  /**
   * Tokenizer fertility report — "how many tokens does each tokenizer
   * charge this slice of the corpus?", the comparison every token-budget
   * decision (P45/P86/P113) and cross-model cost estimate needs: one row
   * per group with `(group, n_docs, n_chars)` plus a `<name>_tokens`
   * BIGINT sum per supplied counter (e.g. whitespace pieces, word-BPE,
   * byte-BPE, WordPiece). Rates (chars/token, tokens/doc) are trivial
   * downstream divisions, kept out so the table replays exactly.
   *
   * Scale shape: the counters are narrow per-row kernels, so the whole
   * report is ONE map-side-combined aggregate over a single corpus scan —
   * no shuffle beyond the tiny per-group exchange. NULL texts contribute
   * to `n_docs` but to no sum (SQL sum semantics on both engines).
   */
  def tokenizerFertility(docs: DataFrame, group: Column, text: Column,
                         counters: Seq[(String, Column => Column)]): DataFrame = {
    require(counters.nonEmpty, "need at least one token counter")
    require(counters.map(_._1).distinct.size == counters.size,
      s"counter names must be unique: ${counters.map(_._1).mkString(", ")}")
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(length(text)).cast("long").as("n_chars")) ++
      counters.map { case (name, f) =>
        sum(f(text)).cast("long").as(s"${name}_tokens")
      }
    docs.groupBy(group.as("group"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
