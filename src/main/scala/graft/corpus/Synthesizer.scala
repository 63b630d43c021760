package graft.corpus

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style corpus generator matching the
  * input_hint table shape exactly:
  * (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
  *
  * Reference analog: the MS MARCO-ish TSV collections the engine indexes
  * (collection.tsv, /root/reference/colbert/evaluation/loaders.py:155-174)
  * — here synthesized from a fixed seed with NO wall clock and NO
  * randomness source other than splitmix64(seed, row), so every run and
  * every parallelism level sees byte-identical rows.
  *
  * Text model (FIXTURES.md §1): Zipfian vocabulary (~5k terms) for
  * realistic stopword-like high-df skew, plus planted rare terms
  * (`plant<i>`) giving queries known answers. html wraps text so the
  * byte-identical-extraction invariant is testable.
  */
object Synthesizer {

  val VocabSize = 5000
  val Epoch = 1704067200000L // 2024-01-01T00:00:00Z, fixed

  /** splitmix64 — public-domain PRNG step; stateless per (seed, i). */
  def mix(seed: Long, i: Long): Long = {
    var z = seed + i * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** Zipf-ish rank: power-law skewed towards low ranks (s≈1). */
  private def zipfIdx(h: Long, vocab: Int = VocabSize): Int = {
    val u = u01(h)
    // inverse-CDF of p(r) ∝ 1/r over [1, V]: r = V^u
    math.min(vocab - 1, math.pow(vocab.toDouble, u).toInt - 1).max(0)
  }

  def term(idx: Int): String = s"w$idx"

  /** Deterministic document text for docId. 20–220 terms; every 7th doc
    * carries planted rare term `plant<docId/7>`. `vocab` defaults to the
    * 5k test vocabulary; benches that need a web-realistic df tail (terms
    * sparser than one posting per doc-range block, the regime block-max
    * pruning exists for) pass a web-scale vocabulary instead. */
  def text(docId: Long, seed: Long, vocab: Int = VocabSize): String = {
    val len0 = 20 + ((mix(seed, docId * 31 + 1) >>> 11) % 201).toInt
    // a plant-carrying doc caps its zipf tokens at 219 so the appended
    // plant term is at most token 220 — the tokenizer's DocMaxTerms cap
    // would otherwise silently drop a plant on the ~1/201 of planted
    // docs drawing the max length, breaking the unique-known-answer
    // invariant the eval gate relies on
    val len = if (docId % 7 == 0) math.min(len0, 219) else len0
    val sb = new StringBuilder(len * 6)
    var j = 0
    while (j < len) {
      if (j > 0) sb.append(' ')
      sb.append(term(zipfIdx(mix(seed, docId * 100003L + j), vocab)))
      j += 1
    }
    if (docId % 7 == 0) { sb.append(" plant").append(docId / 7) }
    sb.toString
  }

  def url(docId: Long): String = {
    val host = (docId % 97).toInt
    f"https://host$host%02d.example/p/$docId%012d"
  }

  def html(text: String): Array[Byte] =
    s"<html><head><title>t</title></head><body><p>$text</p></body></html>"
      .getBytes("UTF-8")

  private val Langs = Array("en", "en", "en", "en", "en", "en", "de", "fr", "es", "zh")

  /** The pages table. Generated distributed (one task per partition slice
    * of spark.range) — scales to any n without driver materialization. */
  def pages(spark: SparkSession, n: Long, partitions: Int, seed: Long = 42L,
            vocab: Int = VocabSize): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { id =>
      val t = text(id, seed, vocab)
      (url(id), new Timestamp(Epoch + id * 1000L), html(t), t,
        Langs(((mix(seed, id * 13 + 7) >>> 11) % Langs.length).toInt))
    }.toDF("url", "warc_ts", "html", "text", "lang")
  }

  /** docId assignment: dense row_number over url — deterministic at every
    * parallelism (SURVEY §2.1 S1, replaces reference "pid = line number").
    * For synthesized pages url order == id order, which makes oracles easy. */
  def withDocIds(pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pages.withColumn("doc_id",
      row_number().over(Window.orderBy(col("url"))).cast("long") - 1)
  }

  /** MS-MARCO-style dev queries (FIXTURES.md §2): planted-term queries with
    * unique known hits, mid-frequency conjunctions, a stopword-only query
    * and a zero-hit query. */
  def queries(spark: SparkSession, nQueries: Int, nDocs: Long, seed: Long = 42L,
              vocab: Int = VocabSize): DataFrame = {
    import spark.implicits._
    val rows = (0 until nQueries).map { q =>
      val h = mix(seed * 7 + 1, q)
      val kind = q % 4
      val txt = kind match {
        case 0 => // planted rare term → unique known answer
          val doc = (math.abs(h) % math.max(1, nDocs / 7)) * 7
          s"plant${doc / 7} ${term(zipfIdx(mix(seed, doc * 100003L), vocab))}"
        case 1 => // mid-frequency conjunction
          s"${term(100 + (math.abs(h) % 400).toInt)} ${term(500 + (math.abs(h >> 8) % 1000).toInt)}"
        case 2 => // high-df stopword-ish pair
          s"${term((math.abs(h) % 10).toInt)} ${term((math.abs(h >> 4) % 30).toInt)}"
        case _ if q % 16 == 3 => "qqqzero qqqhit" // zero-hit
        case _ =>
          s"${term(zipfIdx(h, vocab))} ${term(zipfIdx(h >> 7, vocab))} ${term(zipfIdx(h >> 13, vocab))}"
      }
      (q.toLong, txt)
    }
    rows.toDF("qid", "text")
  }
}
