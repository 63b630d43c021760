package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Web-crawl ingestion operators: URL canonicalization cases pinned one
  * by one, snapshot dedup on a known log, PII scrub on known plants.
  * (Value-level parity with DuckDB is covered by the oracle run; these
  * pin the SEMANTICS on handwritten inputs.) */
class WebSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Web.canonicalizeUrl(col("url"))).as[String].collect().toSeq

  test("canonicalization: case, www, default ports, fragments") {
    assert(canon(
      "HTTPS://WWW.Example.COM/Path/To#frag",
      "https://example.com:443/a",
      "http://example.com:80/a",
      "http://example.com:8080/a") == Seq(
      "https://example.com/Path/To", // path case kept
      "https://example.com/a",
      "http://example.com/a",
      "http://example.com:8080/a")) // non-default port kept
  }

  test("canonicalization: tracking params and separator repair") {
    assert(canon(
      "https://h.co/p?utm_source=x&utm_medium=y&id=5",
      "https://h.co/p?id=5&gclid=abc",
      "https://h.co/p?utm_source=x",
      "https://h.co/p?fbclid=1&utm_a=2") == Seq(
      "https://h.co/p?id=5",
      "https://h.co/p?id=5",
      "https://h.co/p",
      "https://h.co/p"))
  }

  test("canonicalization: a param NAME merely ending in a tracker name is kept") {
    // the tracker regex is anchored to ?/& — '?xgclid=1' is a real param
    assert(canon(
      "https://h.co/p?xgclid=1",
      "https://h.co/p?my_fbclid=2&id=3") == Seq(
      "https://h.co/p?xgclid=1",
      "https://h.co/p?my_fbclid=2&id=3"))
  }

  test("canonicalization: trailing slashes, with and without query") {
    assert(canon(
      "https://h.co/p/",
      "https://h.co/p/?id=1",
      "https://h.co/",
      "https://h.co/a/b") == Seq(
      "https://h.co/p",
      "https://h.co/p?id=1",
      "https://h.co", // root collapses to bare host
      "https://h.co/a/b"))
  }

  test("snapshot dedup keeps the latest warc_ts per canonical url") {
    def ts(s: Long) = new Timestamp(1704067200000L + s * 1000L)
    val log = Seq(
      (0L, "https://A.co/x", ts(0)),
      (1L, "https://a.co/x#f", ts(5)),
      (2L, "https://www.a.co/x?utm_source=z", ts(3)),
      (3L, "https://a.co/y", ts(1)),
      (4L, "https://a.co/y", ts(1)) // ts tie → max doc_id wins
    ).toDF("doc_id", "url", "warc_ts")
    val out = Web.latestSnapshots(log)
      .select(col("canon_url"), col("kept_doc_id"), col("n_snapshots"))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("https://a.co/x", 1L, 3L),
      ("https://a.co/y", 4L, 2L)))
  }

  test("host stats roll up snapshots and distinct canonical pages") {
    def ts(s: Long) = new Timestamp(1704067200000L + s * 1000L)
    val log = Seq(
      (0L, "https://a.co/x", ts(0), "aaaa"),
      (1L, "https://A.co/x/", ts(1), "bb"),
      (2L, "https://a.co/y", ts(2), "c"),
      (3L, "https://b.co/x", ts(3), "dd")
    ).toDF("doc_id", "url", "warc_ts", "text")
    val out = Web.hostStats(log)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("a.co", 3L, 2L, 7L), ("b.co", 1L, 1L, 2L)))
  }

  test("pii scrub redacts emails, ips and phones and counts from the original") {
    val rows = Seq(
      (0L, "mail me at First.Last+x@sub.Example.ORG today"),
      (1L, "server 10.0.255.3 answered"),
      (2L, "call +1-202-555-0142 or (44) 7700 900123 now"),
      (3L, "w1 w2 w3 plain text 12 34")).toDF("doc_id", "t")
    val out = TextStats.piiScrub(rows, col("t"))
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 1, 0, 0, "mail me at <EMAIL> today")))
    assert(out(1) == ((1L, 0, 1, 0, "server <IP> answered")))
    assert(out(2) == ((2L, 0, 0, 2, "call <PHONE> or <PHONE> now")))
    assert(out(3) == ((3L, 0, 0, 0, "w1 w2 w3 plain text 12 34")))
  }
}
