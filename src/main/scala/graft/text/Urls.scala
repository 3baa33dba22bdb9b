package graft.text

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * URL operators for web-corpus curation — the step before any crawl-derived
 * dedup: the same page arrives under `http`/`https`, with/without `www.`,
 * with tracking params, fragments and trailing slashes, and URL-level dedup
 * only works after those variants collapse.
 *
 * All three column functions are codegen'd kernel projections
 * ([[graft.functions.UrlKernel]] — exact rules documented at
 * [[graft.functions.VectorKernels.canonicalizeUrl]]), narrow and
 * streaming-legal; the dedup is one hash aggregation on the canonical
 * form. SQL-registered as `canonicalize_url` / `url_host` /
 * `registrable_domain`.
 */
object Urls {

  /** Canonical form of a URL (fixed deterministic rule set). */
  def canonicalizeUrl(url: Column): Column = vectors.canonicalize_url(url)

  /** Canonical host ("" when unparsable) — per-site group key. */
  def urlHost(url: Column): Column = vectors.url_host(url)

  /** Registrable-domain heuristic (last 2 labels, 3 under known multi-part
    * suffixes; IPv4 passes whole) — per-publisher group key. */
  def registrableDomain(url: Column): Column = vectors.registrable_domain(url)

  /** The URL-extraction regex: scheme + maximal run of non-delimiter
    * characters (whitespace, angle brackets, double quote, single quote,
    * closing paren/bracket end a URL — the prose-boundary set). Plain RE2
    * syntax so Java regex and any RE2 engine read it identically. */
  val UrlPattern: String = "https?://[^\\s<>\"')\\]]+"

  /** All http(s) URLs appearing in free text, in document order — the
    * front step of link-based quality signals (and of feeding text-embedded
    * links into [[canonicalizeUrl]]/[[capPerDomain]]). One codegen'd
    * regexp pass, narrow, streaming-legal. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /**
   * Per-document link-density stats — the boilerplate/spam signal quality
   * pipelines cut on (link farms and nav pages carry high URL-character
   * mass): `n_urls`, `n_distinct_urls`, `url_chars` (total characters
   * inside URLs), and `link_density = url_chars / text chars` (0 for empty
   * text; one IEEE division of exact integers, engine-portable). Columns
   * are appended to `df`. Narrow single-pass projection — no shuffle, no
   * state, streaming-legal.
   */
  def withLinkStats(df: DataFrame, text: Column): DataFrame = {
    val p = graft.functions.distinctPrefixFor(df.columns.toSeq)
    val ucol = p + "urls"
    df.withColumn(ucol, extractUrls(text))
      .withColumn("n_urls", size(col(ucol)))
      .withColumn("n_distinct_urls", size(array_distinct(col(ucol))))
      .withColumn("url_chars",
        aggregate(transform(col(ucol), u => length(u)), lit(0), (acc, x) => acc + x))
      .withColumn("link_density",
        when(length(text) === 0, lit(0.0))
          .otherwise(col("url_chars").cast("double") / length(text).cast("double")))
      .drop(ucol)
  }

  /**
   * Keep ONE row per canonical URL — the smallest id, so the decision is
   * deterministic and engine-portable. Scale shape: the only exchange
   * carries `(canonical-url, id)` pairs into a map-side-combined `min`;
   * the keep set then semi-joins back by id (never by the URL string).
   */
  def dedupByCanonicalUrl(df: DataFrame, id: Column, url: Column): DataFrame = {
    val keep = df
      .select(canonicalizeUrl(url).as("__curl"), id.as("__id"))
      .groupBy(col("__curl")).agg(min(col("__id")).as("__keep"))
      .select(col("__keep"))
    df.join(keep, id === col("__keep"), "left_semi")
  }

  /**
   * Per-registrable-domain URL counts: `(domain, n_urls, n_distinct_urls)`
   * — the "which publishers dominate this crawl" report (and the input to
   * per-domain caps). One map-side-combined aggregate; the distinct count
   * is a single-distinct aggregate (no Expand).
   */
  def domainStats(df: DataFrame, url: Column): DataFrame =
    df.select(registrableDomain(url).as("domain"), canonicalizeUrl(url).as("__c"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("__c")).as("n_distinct_urls"))

  /**
   * Cap each registrable domain at `maxPerDomain` rows — the anti-
   * boilerplate guard every web-corpus recipe applies (one template-heavy
   * site must not dominate the mixture). The kept rows are a deterministic
   * hash draw per domain (the [[graft.sample.Sampling.sampleKPerGroup]]
   * md5 ranking keyed by `id`), so re-runs and engines agree; plans as
   * map-side-partial `WindowGroupLimit` — a billion-URL domain sends ~k
   * rows per task into the exchange, never the domain.
   */
  def capPerDomain(df: DataFrame, id: Column, url: Column, maxPerDomain: Int,
                   salt: String = "graft"): DataFrame =
    graft.sample.Sampling.sampleKPerGroup(
      df.withColumn("__domain", registrableDomain(url)),
      Seq(col("__domain")), id, maxPerDomain, salt)
      .drop("__domain", "sample_rank")
}
