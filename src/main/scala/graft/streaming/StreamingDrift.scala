package graft.streaming

import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Streaming distribution-drift monitoring — "is today's ingest still the
 * corpus we trained the filters on?" answered per event-time window,
 * against a FIXED reference token distribution (yesterday's vintage, the
 * training corpus, a golden sample).
 *
 * Two halves, split exactly where streaming-legal state ends:
 *
 *  1. [[tokenCountsByWindow]] (streaming): per window, count tokens
 *     BUCKETED TO A BOUNDED VOCABULARY — every token outside `vocab`
 *     collapses into one `oovBucket` key, so the stateful aggregation
 *     holds AT MOST `vocab.size + 1` rows per open window no matter what
 *     the stream contains (the unbounded-cardinality trap of a naive
 *     `groupBy(window, token)` is structurally impossible). One stateless
 *     kernel pass (tokenize + InSet probe) next to the source, one
 *     stateful agg, watermark-pruned.
 *  2. [[totalVariationByWindow]] (batch readout over the sink): exact
 *     total-variation distance `TV = ½ Σ |c_i/N − r_i/M|` computed in
 *     INTEGER cross-multiplied form — `tv_scaled = Σ |c_i·M − r_i·N|`
 *     is an exact BIGINT (the LinkRank fixed-point discipline), and the
 *     only IEEE step is the final single division `tv_scaled / (2·N·M)`,
 *     so any engine replays the report bit-for-bit. TV is 0 for an
 *     identical mix, 1 for disjoint support, and bounds every
 *     event-probability shift (|p(A) − q(A)| ≤ TV for all A).
 *
 * Production shape: the stream writes windowed counts to a sink; the
 * report runs as a scheduled batch over (sink, reference) — monitoring
 * reads, never the raw corpus. The reference is a bounded (token, cnt)
 * table: [[graft.text.Vocab]] output, a literal, or any counted sample.
 */
object StreamingDrift {

  val DefaultOovBucket = "<oov>"

  /**
   * Windowed vocab-bucketed token counts over a document stream:
   * `(window, token, cnt)` — `token` ∈ vocab ∪ {oovBucket}. Append-mode
   * legal; state ≤ (vocab.size + 1) rows per open window by construction.
   */
  def tokenCountsByWindow(
      stream: DataFrame, text: Column, eventTimeColumn: String,
      windowDuration: String, watermarkDelay: String,
      vocab: Seq[String], oovBucket: String = DefaultOovBucket): DataFrame = {
    require(vocab.nonEmpty, "vocab must be non-empty")
    require(vocab.distinct.size == vocab.size, "vocab has duplicate tokens")
    require(!vocab.contains(oovBucket),
      s"vocab must not contain the OOV bucket name '$oovBucket'")
    val toks = TextFunctions.tokenize(text, TextFunctions.AsciiTokenPattern)
    stream
      .withWatermark(eventTimeColumn, watermarkDelay)
      .select(col(eventTimeColumn).as("__ts"), explode(toks).as("__tok"))
      // InSet probe (hash set, codegen) — the bounded-bucket projection
      .withColumn("token",
        when(col("__tok").isInCollection(vocab), col("__tok"))
          .otherwise(lit(oovBucket)))
      .groupBy(window(col("__ts"), windowDuration), col("token"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Exact total-variation drift per window (batch readout).
   *
   * @param counts    windowed counts with columns `windowCols…, token, cnt`
   *                  (the sink of [[tokenCountsByWindow]], window flattened
   *                  to orderable columns by the caller).
   * @param reference bounded `(token, cnt)` table — the fixed distribution
   *                  to compare against. Tokens of `counts` absent here
   *                  count with reference mass 0 and vice versa.
   * @return one row per window: `(windowCols…, n_tokens, ref_tokens,
   *         tv_scaled, tv)` — `tv_scaled = Σ |c_i·M − r_i·N|` exact BIGINT,
   *         `tv = tv_scaled / (2·N·M)` ∈ [0, 1] the only IEEE step.
   *
   * Scale shape: the reference and the per-window count sets are bounded
   * (vocab-bucketed), so the windows × reference grid is tiny; the only
   * corpus-sized object — the raw stream — never reaches this function.
   */
  val DefaultMaxReferenceTokens: Int = 1 << 20

  def totalVariationByWindow(counts: DataFrame, windowCols: Seq[String],
                             reference: DataFrame,
                             maxReferenceTokens: Int = DefaultMaxReferenceTokens): DataFrame = {
    require(windowCols.nonEmpty, "need at least one window column")
    require(maxReferenceTokens > 0, "maxReferenceTokens must be positive")
    // pre-aggregate the reference: a duplicate token row (e.g. a reference
    // built by unioning counted samples) would otherwise fan out the grid
    // join and silently inflate tv_scaled
    val ref = reference
      .groupBy(col("token"))
      .agg(sum(col("cnt").cast("long")).as("rcnt"))
    // The windows x ref grid below BROADCASTS the reference — safe only
    // because the reference is vocab-bucketed/bounded. Enforce that rather
    // than assume it: a caller handing an unbounded raw token table would
    // otherwise OOM the driver on the broadcast. One bounded probe action
    // (limit stops the count at the cap) on a table that is tiny by
    // contract; the distinct-token count, not the token mass, is capped.
    val refDistinct = ref.limit(maxReferenceTokens + 1).count()
    require(refDistinct <= maxReferenceTokens,
      s"reference has >$maxReferenceTokens distinct tokens — it must be a " +
        "bounded (vocab-bucketed) distribution; bucket it (e.g. " +
        "tokenCountsByWindow's vocab + OOV collapse) before the readout")
    // M: one scalar row (bounded reference)
    val m = ref.agg(coalesce(sum(col("rcnt")), lit(0L)).as("__m"))
    val wc = windowCols.map(col)
    // N per window
    val n = counts.groupBy(wc: _*)
      .agg(sum(col("cnt")).cast("long").as("__n"))
    // grid = windows x (reference tokens ∪ tokens observed in the window):
    // full-outer join per window key over the token axis
    val c = counts.select(wc :+ col("token") :+ col("cnt").cast("long").as("ccnt"): _*)
    val windows = n.select(wc: _*)
    val grid = windows.join(broadcast(ref)) // windows x ref tokens
      .join(c, windowCols :+ "token", "full_outer")
      .select(wc.map(cn => cn) :+ col("token") :+
        coalesce(col("rcnt"), lit(0L)).as("rcnt") :+
        coalesce(col("ccnt"), lit(0L)).as("ccnt"): _*)
    // Cross-multiplied terms in decimal(38,0), NOT long: c_i*M and r_i*N can
    // each reach ~8.5e37 (N, M are corpus token counts — 100 TB-scale inputs
    // plausibly push N*M past 2^63), where long arithmetic either throws
    // (ANSI, Spark 4 default) or silently wraps (ansi=false). A long*long
    // product fits decimal(38,0) exactly, so the sum stays exact; only the
    // final tv division is IEEE. Beyond decimal(38,0) (tv_scaled >= 1e38,
    // i.e. 2*N*M itself overflows 38 digits) the exact-BIGINT output
    // contract is unmeetable — fail fast instead of returning null/garbage.
    val dec = "decimal(38,0)"
    grid
      .join(n, windowCols)
      .crossJoin(broadcast(m))
      .withColumn("__term", abs(
        col("ccnt").cast(dec) * col("__m").cast(dec) -
          col("rcnt").cast(dec) * col("__n").cast(dec)))
      .groupBy(wc: _*)
      .agg(
        first(col("__n")).as("n_tokens"),
        first(col("__m")).as("ref_tokens"),
        sum(col("__term")).as("__tv_dec"))
      .withColumn("tv_scaled",
        when(col("__tv_dec").isNull || // decimal overflow under ansi=false
          col("__tv_dec") > lit(Long.MaxValue).cast(dec),
          raise_error(concat(
            lit("totalVariationByWindow: tv_scaled exceeds BIGINT for window "),
            concat_ws(",", wc.map(_.cast("string")): _*),
            lit(" — the exact-integer replay contract cannot hold; " +
              "compare distributions on a counted sample instead"))).cast("long"))
          .otherwise(col("__tv_dec").cast("long")))
      .drop("__tv_dec")
      .withColumn("tv",
        when(col("n_tokens") === 0 || col("ref_tokens") === 0, lit(null))
          .otherwise(col("tv_scaled").cast("double") /
            (lit(2.0) * col("n_tokens").cast("double") * col("ref_tokens").cast("double"))))
  }
}
