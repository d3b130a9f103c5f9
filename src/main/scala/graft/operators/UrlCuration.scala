package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation — the most common web-corpus dimension: normalize
  * crawl URLs to a canonical form, extract the registered domain, and
  * drive per-domain policy (stats, caps, mix monitoring) off it.
  *
  * Everything here is a pure row-local expression chain over Spark's
  * codegen'd builtins (`parse_url`, `regexp_*`, `split`) — zero exchange
  * until a consumer aggregates, so the normalize/extract stage runs
  * inside the scan's WholeStageCodegen at any corpus size. The DuckDB
  * oracles replay the same chains with string ops.
  */
object UrlCuration {

  /** Multi-label public suffixes recognized by [[registeredDomain]] —
    * a documented subset of the Public Suffix List covering the common
    * ccTLD second-level registries; the full PSL is a data file a
    * deployment swaps in (broadcast-joined or compiled in, same
    * expression shape). Kept deliberately small and explicit so the
    * oracle can pin the exact semantics.
    */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.mx", "co.in", "co.nz", "com.sg", "com.cn")

  /** Canonical URL form — the dedup key a crawl pipeline joins on:
    *   1. scheme lowercased;
    *   2. host lowercased, one leading `www.` stripped;
    *   3. default ports dropped (`http:80`, `https:443`); others kept;
    *   4. fragment dropped;
    *   5. one trailing slash stripped from the path (`/a/` → `/a`,
    *      bare `/` → empty);
    *   6. empty query dropped, non-empty query kept verbatim
    *      (param-reorder/tracking-strip are policy, not normalization);
    *   7. null, blank, or host-less input → null.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val rawHost = parse_url(url, lit("HOST"))
    val host = regexp_replace(lower(rawHost), "^www\\.", "")
    val port = regexp_extract(parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_replace(parse_url(url, lit("PATH")), "/$", "")
    val query = parse_url(url, lit("QUERY"))
    when(scheme.isNull || rawHost.isNull || rawHost === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        coalesce(path, lit("")),
        when(query.isNotNull && query =!= "", concat(lit("?"), query))
          .otherwise(lit(""))))
  }

  /** Lowercased host of a URL with one leading `www.` stripped — the
    * input [[registeredDomain]] expects.
    */
  def hostOf(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** Registered (pay-level) domain of a host: the last two labels, or the
    * last three when the last two are a recognized multi-label public
    * suffix ([[MultiPartSuffixes]]). Single-label hosts (intranet names)
    * pass through unchanged.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // concat_ws skips nulls, so out-of-range element_at can't corrupt a
    // guarded branch; the n-guards pick the branch
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(n >= 3 && last2.isin(MultiPartSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Registered domain straight from a URL. */
  def domainOfUrl(url: Column): Column = registeredDomain(hostOf(url))

  /** Per-domain corpus stats — the crawl-mix report: document count,
    * distinct hosts under the domain, and total characters. One
    * map-side-combinable aggregation keyed by domain.
    */
  def domainStats(df: DataFrame, urlCol: String, sizeCol: String): DataFrame =
    df.select(domainOfUrl(col(urlCol)).as("domain"),
        hostOf(col(urlCol)).as("__host"), col(sizeCol))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("__host")).as("n_hosts"),
        sum(col(sizeCol)).as("n_chars"))

  /** Per-domain document cap — [[Sampling.quotaPerGroup]] keyed by the
    * registered domain: keep at most `quota` documents per domain by
    * `preference` order (Catalyst's WindowGroupLimit pre-prunes inside
    * the map tasks, so losers never reach the shuffle). The standard
    * anti-boilerplate / anti-SEO-farm lever in web-corpus curation.
    */
  def domainQuota(df: DataFrame, urlCol: String, quota: Int,
                  preference: Seq[Column]): DataFrame =
    Sampling.quotaPerGroup(
      df.withColumn("domain", domainOfUrl(col(urlCol))),
      "domain", quota, preference)

  /** Domain-mix drift between two crawl snapshots — [[Drift.categoricalDrift]]
    * over the registered domain: 1-row chi²/JS report, aggregation
    * bounded by distinct domains on both sides.
    */
  def domainMixDrift(base: DataFrame, cur: DataFrame, urlCol: String): DataFrame =
    Drift.categoricalDrift(
      base.select(domainOfUrl(col(urlCol)).as("domain")),
      cur.select(domainOfUrl(col(urlCol)).as("domain")),
      "domain")
}
