package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus ingestion operators over the input_hint page shape
  * `(url, warc_ts, ...)`: URL canonicalization, latest-snapshot dedup and
  * per-host rollups — the steps every Common-Crawl-style pipeline runs
  * BEFORE content dedup (the same crawl re-fetches a page many times
  * under cosmetically different URLs; indexing all of them wastes the
  * whole downstream pipeline).
  *
  * Reference analog: the reference assumes a pre-deduplicated passage
  * TSV keyed by line number (colbert/data/collection.py:14-97); our
  * engine owns the raw-crawl side, so URL identity is an operator here.
  *
  * Scale design (10^12 pages): canonicalization is a per-row projection
  * (regexp chain, whole-stage codegen — scan speed); snapshot dedup is
  * ONE shuffle on the canonical url with map-side partial aggregation
  * (max_by/count/min/max all combine); host rollups shuffle on the host
  * — bounded cardinality (~10^8 hosts), count-distinct handled by a
  * two-level partial aggregate, heavy hosts split by AQE skew handling.
  */
object Web {

  /** Query parameters that never change page identity (analytics
    * trackers) — dropped during canonicalization. Anchored to a
    * preceding `?`/`&` (lookbehind keeps the separator out of the match,
    * so replacement semantics are unchanged): without the anchor a
    * non-tracking param whose NAME merely ends in a tracker name
    * (`?xgclid=1`) had its tail eaten, merging genuinely distinct urls. */
  val TrackingParamsRe = "(?<=[?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid)=[^&#]*"

  private def stripFragment(u: Column): Column = regexp_replace(u, "#.*", "")

  /** Lowercased scheme ("" when the url has no `scheme://`). */
  def schemeOf(url: Column): Column =
    lower(regexp_extract(stripFragment(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical host: lowercased, leading `www.` and the scheme's default
    * port stripped. Port stripping needs the scheme, hence the pair. */
  def hostOf(url: Column): Column = {
    val noFrag = stripFragment(url)
    val scheme = schemeOf(url)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
  }

  /** Canonical URL: fragment dropped; scheme + host lowercased; `www.`
    * and default ports stripped; tracking params removed (query separator
    * runs repaired, empty query dropped); trailing slash stripped (also
    * before `?`). Path case and the order of surviving params are
    * IDENTITY-BEARING and kept as-is. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = stripFragment(url)
    val pathq0 = regexp_replace(
      regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "^[^/?]*", "")
    val q0 = regexp_replace(pathq0, TrackingParamsRe, "")
    val q1 = regexp_replace(q0, "&&+", "&")
    val q2 = regexp_replace(q1, "\\?&", "?")
    val q3 = regexp_replace(q2, "[?&]$", "")
    val p1 = regexp_replace(q3, "/$", "")
    val p2 = regexp_replace(p1, "/\\?", "?")
    concat(schemeOf(url), lit("://"), hostOf(url), p2)
  }

  /** Snapshot dedup: group the crawl log by canonical url, keep the
    * LATEST snapshot (max warc_ts, ties to max doc_id — recrawls within
    * one timestamp resolve deterministically). Emits the kept row id,
    * the group size and the crawl-window bounds per canonical url.
    * Input: (doc_id, url, warc_ts). */
  def latestSnapshots(pages: DataFrame): DataFrame =
    pages
      .withColumn("canon_url", canonicalizeUrl(col("url")))
      .groupBy(col("canon_url"))
      .agg(
        max(struct(col("warc_ts"), col("doc_id"))).as("kept"),
        count(lit(1)).as("n_snapshots"),
        min(col("warc_ts")).as("first_ts"),
        max(col("warc_ts")).as("last_ts"))
      .select(col("canon_url"), col("kept.doc_id").as("kept_doc_id"),
        col("n_snapshots"), col("first_ts"), col("last_ts"))

  /** Per-host crawl rollup: snapshot count, distinct canonical pages and
    * total text volume — the crawl-budget / politeness table.
    * Input: (doc_id, url, warc_ts, text). */
  def hostStats(pages: DataFrame): DataFrame =
    pages
      .select(hostOf(col("url")).as("host"),
        canonicalizeUrl(col("url")).as("canon_url"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_snapshots"),
        countDistinct(col("canon_url")).as("n_pages"),
        sum(col("n_chars")).as("total_chars"))
}
