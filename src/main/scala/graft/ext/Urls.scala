package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and registrable-domain extraction — the first
  * operators of every web-crawl curation pipeline: crawl frontiers
  * dedup on the CANONICAL form (case, default ports, `www.`, trailing
  * slashes, fragments, tracking params and query-param order are all
  * fetch-identical), and per-site budgets/robots/quality priors key on
  * the REGISTRABLE domain (the public-suffix + 1 label — `a.blog.
  * example.co.uk` and `example.co.uk` are one site, `example.co.uk`
  * and `other.co.uk` are not).
  *
  * Canonicalization itself is the native
  * [[graft.functions.UrlCanonicalize]] expression (one fused pass per
  * row; its scaladoc states the exact step contract the DuckDB oracle
  * replays). Domain extraction is pure Column arithmetic over the
  * host's dot-labels — no lambdas, stays inside codegen.
  *
  * The embedded suffix set is PUBLIC-SUFFIX-LITE: the handful of
  * two-level suffixes that cover the overwhelming share of real crawl
  * traffic. The real public-suffix list is ~10k entries and changes
  * monthly — at production scale it rides in exactly like this (a
  * plan-literal set, or a broadcast map for the full list), so the
  * shape is the real one and only the table is abbreviated.
  */
object Urls {

  /** Two-level public suffixes recognized by [[registrableDomain]]
    * (public-suffix-lite — see the object scaladoc). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "com.ar", "com.tr", "com.sg")

  /** Canonical URL (null for non-URL input — no scheme separator). */
  def canonicalizeUrl(url: Column): Column = {
    // any active session works: the function registry is per-session
    // and ensureRegistered is idempotent
    val spark = org.apache.spark.sql.SparkSession.active
    graft.functions.GraftFunctions.urlCanonicalize(spark, url)
  }

  /** Registrable domain of a HOST string (lowercase, no port):
    * public-suffix + one label. Hosts with fewer labels than the
    * suffix needs return the host unchanged (a bare `localhost` or
    * `example.com` is its own registrable domain). A NON-DEFAULT port
    * surviving canonicalization (`example.com:8080`) stays attached
    * to the last label and produces a port-qualified bin — strip it
    * upstream if ports should fold together. Pure Column expression
    * over the dot-split labels. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(n <= 2, host)
      .when(lastTwo.isin(TwoLevelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Host of an already-CANONICAL url (scheme://host[path][?q]) —
    * cheap extraction that relies on the canonical form's guarantees
    * (lowercase, no port, no fragment). */
  def canonicalHost(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^[a-z0-9+.-]+://([^/?]*)", 1)

  /** Registrable-domain DEDUP CENSUS — the crawl-frontier report:
    * canonicalize every raw URL, group by registrable domain, and
    * count raw URLs, distinct canonical URLs (the true fetch count)
    * and the duplicates the canonicalization collapsed. Non-URL rows
    * (canonical form null) are censused under domain '(invalid)'
    * with zero canonical forms rather than dropped — a crawl log's
    * junk rate is itself a signal.
    *
    * Scale shape: canonicalization and domain extraction are
    * map-side; the census is one aggregate keyed by (domain,
    * canonical) for the distinct count, partially aggregated
    * map-side, then one domain-keyed rollup. URLs never shuffle raw
    * — only (domain, canonical-hash) pairs would at the 100-TB form
    * (here the canonical string itself is the exactness-friendly
    * key; swap in xxhash64(canonical) when strings dominate the
    * exchange). Returns (domain, n_raw, n_canonical, n_dup). */
  def domainDedupCensus(df: DataFrame, urlCol: Column): DataFrame = {
    val canon = df.select(canonicalizeUrl(urlCol).as("__canon"))
      .select(
        when(col("__canon").isNull, lit("(invalid)"))
          .otherwise(registrableDomain(canonicalHost(col("__canon"))))
          .as("domain"),
        col("__canon"))
    canon.groupBy("domain", "__canon")
      .agg(count(lit(1)).as("__n"))
      .groupBy("domain")
      .agg(sum("__n").as("n_raw"),
           sum(when(col("__canon").isNotNull, 1L).otherwise(0L))
             .as("n_canonical"))
      .select(col("domain"), col("n_raw"), col("n_canonical"),
              (col("n_raw") - col("n_canonical")).as("n_dup"))
  }
}
