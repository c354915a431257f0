package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain curation operators ([EXT], SURVEY §2.10 family): the
  * provenance-side counterpart of the text-quality filters. Web-scale
  * corpora are curated by WHERE a page came from as much as by what it
  * says — blocklisted domains are dropped wholesale, and no single
  * domain may dominate the training mix (per-domain caps are standard
  * in C4/RefinedWeb-style pipelines).
  *
  * Everything here is built from codegen'd column expressions
  * (`regexp_extract`/`split`/`element_at`) — no UDFs — so domain
  * extraction fuses into the same whole-stage-codegen pass as the
  * text filters, and the plans stay oracle-replicable in ANSI SQL.
  *
  * Shape at 100 TB: extraction is a pure projection (zero shuffle);
  * blocklists are broadcast anti-joins (a blocklist is ~1e5–1e7
  * domains — megabytes); the per-domain cap is the one shuffle, and it
  * is salted two-phase so a mega-domain (en.wikipedia.org at 1e8
  * pages) never lands on one task — see [[capPerDomain]].
  */
object UrlOps {

  /** Lowercased host of a URL: the text between `scheme://` (userinfo
    * stripped) and the first `/`, `:`, `?`, or `#`. Empty string when
    * the value does not look like a URL — callers can filter on that.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Multi-label public suffixes the registered-domain heuristic
    * recognizes (the full Mozilla public-suffix list is data, not
    * code — production feeds the real list through the same CASE
    * shape; this default covers the common country-code second-levels).
    */
  val multiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.tw",
    "co.in", "co.kr", "com.mx", "co.za", "com.sg", "com.ar")

  /** Registered domain (site identity) of a host: the last two labels,
    * or the last three when the last two form a known multi-label
    * suffix (`foo.co.uk` → `foo.co.uk`, not `co.uk`). Hosts with ≤ 2
    * labels pass through unchanged.
    */
  def registeredDomain(hostCol: Column,
                       suffixes: Seq[String] = multiPartSuffixes): Column = {
    val parts = split(hostCol, "\\.")
    val lastTwo = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val lastThree = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(size(parts) <= lit(2), hostCol)
      .when(lastTwo.isin(suffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Project `urlCol` into host + registered-domain columns. Pure
    * projection — fuses into the enclosing codegen stage.
    */
  def withUrlParts(df: DataFrame, urlCol: String, hostOut: String = "host",
                   domainOut: String = "domain"): DataFrame =
    df.withColumn(hostOut, host(col(urlCol)))
      .withColumn(domainOut, registeredDomain(col(hostOut)))

  /** Drop rows whose registered domain is blocklisted. The in-memory
    * overload folds small lists into an `IN` predicate (pushed to the
    * scan when `domainCol` is stored); the DataFrame overload is a
    * broadcast anti-join for real blocklists.
    */
  def filterBlockedDomains(df: DataFrame, domainCol: String,
                           blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) df
    else df.filter(!col(domainCol).isin(blocked: _*))

  def filterBlockedDomains(df: DataFrame, domainCol: String,
                           blocklist: DataFrame): DataFrame = {
    val b = broadcast(
      blocklist.toDF("__blocked__").select(lower(trim(col("__blocked__")))
        .as("__blocked__")).distinct())
    df.join(b, col(domainCol) === col("__blocked__"), "left_anti")
  }

  /** Keep at most `cap` rows per domain, smallest `orderCol` first
    * (`orderCol` must be a unique key — doc id — so the choice is
    * deterministic). Two-phase salted window:
    *
    * phase 1 shuffles by (domain, xxhash64(order) mod salt), so a
    * mega-domain spreads over `salt` tasks instead of one straggler —
    * each salt bucket keeps its local top-`cap` (a bucket row with
    * local rank > cap has ≥ cap earlier rows in its OWN bucket, so its
    * global rank is also > cap: dropping it is safe);
    * phase 2 ranks the survivors — at most `salt·cap` rows per domain,
    * bounded regardless of how hot the domain is. Equality with the
    * single-window plan is law-checked in UrlOpsSpec.
    */
  def capPerDomain(df: DataFrame, domainCol: String, orderCol: String,
                   cap: Int, salt: Int = 16): DataFrame = {
    require(cap > 0 && salt > 0, "cap and salt must be positive")
    val bucket = Window
      .partitionBy(col(domainCol), pmod(xxhash64(col(orderCol)), lit(salt)))
      .orderBy(col(orderCol))
    val global = Window.partitionBy(col(domainCol)).orderBy(col(orderCol))
    df.withColumn("__br__", row_number().over(bucket))
      .filter(col("__br__") <= cap).drop("__br__")
      .withColumn("__r__", row_number().over(global))
      .filter(col("__r__") <= cap).drop("__r__")
  }

  /** Query parameters stripped by [[canonicalize]]: per-click tracking
    * identifiers that make byte-identical pages look like distinct
    * URLs (the #1 cause of URL-level dedup misses in web corpora).
    * Matched against the full `key=value` chunk, anchored at the key.
    */
  val TrackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|ref_src|spm)(=.*)?$"

  /** Canonical URL form for URL-level dedup — two page fetches that
    * differ only in case of scheme/host, a default port, tracking
    * params, param order, trailing slashes, or the fragment collapse
    * to one key:
    *
    *   - scheme and host lowercased (path case is significant and
    *     kept)
    *   - default ports stripped (`:80` for http, `:443` for https)
    *   - fragment dropped
    *   - tracking params dropped ([[TrackingParamRe]]); survivors
    *     sorted byte-wise and re-joined, `?` dropped when none remain
    *   - path: trailing `/` runs stripped, empty path → `/`
    *
    * Values that do not parse as `scheme://…` pass through trimmed and
    * unchanged (canonicalization must never invent structure).
    *
    * Pure codegen'd projection — regexp_extract / array ops only, no
    * UDF, no shuffle — and every step is replicated verbatim by the
    * DuckDB oracle (binary string sort in both engines).
    */
  def canonicalize(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)", 1)
    val h = lower(regexp_extract(hostport, "^([^:]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val rawPath = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path0 = regexp_replace(rawPath, "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val rawQ = regexp_extract(u, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQ, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "", u).otherwise(concat(
      scheme, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path, query))
  }

  /** Add the canonical form of `urlCol` as `outCol`. */
  def withCanonicalUrl(df: DataFrame, urlCol: String,
                       outCol: String = "canon_url"): DataFrame =
    df.withColumn(outCol, canonicalize(col(urlCol)))
}
