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
