package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL/domain operators for web-crawl training-data pipelines: host
 * extraction, public-suffix-aware registered-domain derivation, and the
 * per-domain reputation census (C4/RefinedWeb/Dolma all blocklist spam
 * domains from exactly this aggregate before any per-document filtering —
 * a content farm is cheaper to kill once at the domain level than a
 * million times at the document level).
 *
 * Everything is built-in codegen'd expressions over the URL string —
 * no UDF, no per-row regex beyond `parse_url`'s native host extraction.
 */
object WebOps {

  /** Multi-label public suffixes the corpus can encounter. The real
    * public-suffix list is ~9k entries and ships as a broadcast lookup in
    * a production deployment; the suffix RULE (registered domain = last 2
    * labels, or last 3 when the last 2 are themselves a public suffix) is
    * what the engine implements, and it is exercised by both branches. */
  final val MultiPartSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp")

  /** Hostname of `url` via Spark's native `parse_url` expression. */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  /** Public-suffix-aware registered domain of a hostname: the last two
    * labels, or the last three when the last two are a listed multi-part
    * suffix (www.news.co.uk -> news.co.uk; www.blog.example.com ->
    * example.com). Pure string expressions — stays in codegen. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(n >= 3 && last2.isin(MultiPartSuffixes: _*),
      concat_ws(".", element_at(labels, -3), element_at(labels, -2),
        element_at(labels, -1)))
      .otherwise(last2)
  }

  /** Tracking parameters every canonicalizer strips — the query-string
    * noise (analytics attribution) that makes one page look like many. */
  final val TrackingParamRe = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

  /** URL canonicalization — the crawl-frontier normalization step that
    * runs BEFORE content dedup (the same page arrives as
    * `HTTPS://WWW.Site.org:443/a/?utm_source=feed&b=2&a=1#frag` and
    * `https://www.site.org/a?a=1&b=2`; fetching both wastes a fetch and
    * poisons content dedup with twins): lowercase scheme+host, drop the
    * fragment, drop default ports (:80/:443), drop tracking parameters
    * ([[TrackingParamRe]]), sort the surviving query parameters, and
    * strip trailing path slashes (root stays `/`). Pure built-in string
    * expressions per row — map-only, order-insensitive, no UDF. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val host = regexp_replace(
      lower(regexp_extract(noFrag, "^([^/?]+)", 1)), ":(443|80)$", "")
    val pathQ = regexp_replace(noFrag, "^[^/?]+", "")
    val rawPath = regexp_extract(pathQ, "^([^?]*)", 1)
    val path = {
      val stripped = regexp_replace(rawPath, "/+$", "")
      when(stripped === "", lit("/")).otherwise(stripped)
    }
    val query = regexp_extract(pathQ, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val qs = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Crawl-frontier URL dedup: canonicalize, then collapse every page's
    * decoration variants into one row per canonical URL — count of
    * collapsed variants plus the kept (minimum) doc_id, the
    * fetch-once/keep-one policy a frontier applies. ONE hash aggregation
    * on the derived canonical key (map-side partials do the collapsing
    * where the variants sit); nothing pairwise, text never moves. */
  def urlDedup(pages: DataFrame): DataFrame =
    pages
      .select(canonicalizeUrl(col("url")).as("canonical_url"), col("doc_id"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("kept_doc_id"))

  /** Crawl-snapshot diff — the refresh-QA join run before admitting a new
    * dump (CommonCrawl-style pipelines keep per-URL content fingerprints
    * exactly for this): canonicalize both snapshots, pre-collapse each to
    * one row per canonical URL (min doc_id + ITS fingerprint, the d24
    * keep policy), FULL OUTER join on the canonical key, and classify —
    * `added` (B only), `removed` (A only), `changed` (both, fingerprints
    * differ), `unchanged`. The status census drives refresh economics
    * (a dump that is 95% unchanged re-fetches almost nothing) and the
    * `changed` set is the recrawl work-list.
    *
    * Scale shape: two hash aggregations (one per snapshot, map-side
    * collapse) + ONE co-partitioned full-outer equi-join on the canonical
    * key — the canonical snapshot-diff plan; AQE broadcasts a side that
    * turns out small (incremental dumps usually are). Text never moves:
    * only the 16-byte fingerprint rides the join. */
  def crawlDiff(a: DataFrame, b: DataFrame): DataFrame = {
    def side(df: DataFrame, idCol: String, fpCol: String) = df
      .select(canonicalizeUrl(col("url")).as("canonical_url"),
        col("doc_id"), md5(col("text")).as("__fp"))
      .groupBy("canonical_url")
      .agg(min_by(col("__fp"), col("doc_id")).as(fpCol),
        min(col("doc_id")).as(idCol))
    side(a, "a_doc_id", "__fp_a")
      .join(side(b, "b_doc_id", "__fp_b"), Seq("canonical_url"), "full_outer")
      .select(col("canonical_url"),
        when(col("__fp_a").isNull, lit("added"))
          .when(col("__fp_b").isNull, lit("removed"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        coalesce(col("a_doc_id"), lit(-1L)).as("a_doc_id"),
        coalesce(col("b_doc_id"), lit(-1L)).as("b_doc_id"))
  }

  /** Outlink extraction + site-level link graph — the bridge from raw
    * HTML-ish text to the graph operators (PageRank/TrustRank run on
    * exactly this edge list in web-quality pipelines; a domain's inlink
    * profile is a quality prior per Gyongyi's TrustRank setup): pull
    * `href="..."` targets out of the text with one codegen'd
    * `regexp_extract_all`, explode, map BOTH endpoints through the same
    * public-suffix rule ([[registeredDomain]]), drop self-loops, and
    * census the (src, dst) edges. ONE corpus scan + explode bounded by
    * links-per-doc + ONE hash aggregation on the edge key — the edge
    * list is domain×domain-sized, orders of magnitude below the corpus. */
  def linkGraph(pages: DataFrame): DataFrame = {
    val src = registeredDomain(host(col("url")))
    val dst = registeredDomain(host(col("link")))
    pages
      .select(src.as("src_domain"),
        explode(regexp_extract_all(col("text"),
          lit("href=\"([^\"]+)\""), lit(1))).as("link"))
      .select(col("src_domain"), dst.as("dst_domain"))
      .filter(col("src_domain") =!= col("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))
  }

  /** Robots-style path-prefix blocklist — URL filtering against a rules
    * table of (domain, path prefix) disallows, the compliance gate a
    * crawl applies before fetch AND a corpus applies retroactively when
    * a site's robots.txt tightens. Matching is at path-SEGMENT
    * boundaries (`/private` blocks `/private` and `/private/x`, not
    * `/privateX` — swap the prefix generator for byte prefixes to get
    * robots.txt's raw-string variant). The scalable trick: a prefix
    * match is a theta join (`path LIKE prefix || '%'`) that no engine
    * can hash — so each URL EXPLODES its own segment prefixes (bounded
    * by path depth, ~4-8 per URL) and the match becomes a plain
    * equi-join on (domain, prefix) against the broadcast-sized rules
    * table. Output is the page set with the `blocked` verdict. */
  def pathPrefixBlock(pages: DataFrame, rules: DataFrame): DataFrame = {
    val hostC = host(col("url"))
    val domain = registeredDomain(hostC)
    val path = regexp_replace(regexp_replace(col("url"),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", ""), "[?#].*$", "")
    val labels = split(path, "/")
    // guard: sequence(1, 0) would generate DESCENDING [1, 0] for a
    // rootless path — emit no prefixes instead
    val prefixes = when(size(labels) > 1,
      transform(sequence(lit(1), size(labels) - 1),
        i => concat_ws("/", slice(labels, lit(1), i + 1))))
      .otherwise(array().cast("array<string>"))
    val exploded = pages
      .select(col("doc_id"), domain.as("domain"),
        explode(prefixes).as("prefix"))
    val blockedIds = exploded
      .join(broadcast(rules.select(col("domain"), col("prefix"))),
        Seq("domain", "prefix"))
      .select(col("doc_id")).distinct()
      .withColumn("blocked", lit(true))
    pages
      .join(blockedIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("url"),
        coalesce(col("blocked"), lit(false)).as("blocked"))
  }

  /** Per-registered-domain reputation census over `docs(doc_id, url,
    * text)`: document count, distinct-host count, exact-duplicate share
    * and corpus share (both as integer parts-per-million — nothing
    * floating crosses the result), and the spam verdict
    * (`dup_ppm >= dupPpmMax` OR `share_ppm >= sharePpmMax`) a pipeline
    * feeds back as a domain blocklist.
    *
    * Shape at scale: ONE hash aggregation keyed on the derived registered
    * domain (multi-distinct via Spark's Expand — still a single exchange
    * on the group key), plus a 1-row corpus total broadcast back over the
    * domain-sized census. Text never moves — only its 16-byte md5
    * fingerprint enters the aggregate. No pairwise anything: the dup share
    * is count-distinct-of-fingerprint, the same L1 discipline. */
  def domainReputation(docs: DataFrame, dupPpmMax: Long = 500000L,
                       sharePpmMax: Long = 200000L): DataFrame = {
    val census = docs
      .select(registeredDomain(host(col("url"))).as("registered_domain"),
        host(col("url")).as("__host"), md5(col("text")).as("__fp"))
      .groupBy("registered_domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__host")).as("n_hosts"),
        countDistinct(col("__fp")).as("n_uniq"))
    val total = docs.agg(count(lit(1)).as("__total"))
    census
      .crossJoin(broadcast(total)) // 1 row -> BroadcastNestedLoopJoin
      .withColumn("dup_ppm",
        expr("(n_docs - n_uniq) * 1000000 div n_docs"))
      .withColumn("share_ppm", expr("n_docs * 1000000 div __total"))
      .select(col("registered_domain"), col("n_docs"), col("n_hosts"),
        col("dup_ppm"), col("share_ppm"),
        (col("dup_ppm") >= dupPpmMax || col("share_ppm") >= sharePpmMax)
          .as("flagged"))
  }
}
