package graft.query

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ranking persistence with the reference's output contract:
  * flat TSV `qid \t doc_id \t rank \t score` plus a `.meta` provenance
  * sidecar (reference: colbert/data/ranking.py:63-81 writes
  * ranking.tsv + ranking.tsv.meta). Also the queries/qrels TSV scans
  * (loaders.py:15-56) with their dup asserts.
  *
  * Scale note: rankings are k rows per query — "small" data by
  * construction; the coalesce(1) single-file write mirrors the reference
  * contract and is intentionally NOT how the big tables are written. */
object RankingIO {

  def writeRanking(ranking: DataFrame, outDir: String, meta: Map[String, String] = Map.empty): Unit = {
    ranking
      .select(col("qid"), col("doc_id"), col("rank"), col("score"))
      .sort(col("qid"), col("rank"))
      .coalesce(1)
      .write.mode("overwrite").option("sep", "\t").csv(outDir)
    // minimal JSON string escaping — provenance values are caller text
    // (paths, run names) and a stray quote/backslash must not corrupt
    // the sidecar
    def esc(x: String): String =
      x.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c => c.toString
      }
    val metaJson = (meta + ("format" -> "qid\tdoc_id\trank\tscore"))
      .toSeq.sorted
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    Files.writeString(Paths.get(outDir).resolve("_ranking.meta"), metaJson)
  }

  def readRanking(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("qid", LongType), StructField("doc_id", LongType),
        StructField("rank", IntegerType), StructField("score", DoubleType))))
      .option("sep", "\t").csv(dir)

  /** Queries TSV `qid \t text` with the duplicate-qid assert
    * (loaders.py:25). */
  def readQueriesTsv(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read
      .schema(StructType(Seq(
        StructField("qid", LongType), StructField("text", StringType))))
      .option("sep", "\t").csv(path)
    val dups = df.groupBy(col("qid")).count().filter(col("count") > 1).count()
    require(dups == 0, s"duplicate qids in $path")
    df
  }

  /** Queries from JSONL QA rows (reference queries.py:50-67: objects with
    * qid + question/text). */
  def readQueriesJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
      .select(col("qid").cast("long").as("qid"),
        coalesce(col("question"), col("text")).as("text"))

  /** Remap ranking docIds through a (doc_id, new_doc_id) mapping table —
    * the TranslateAbleCollection analog (reference collection.py:102-149:
    * bijection new_pid <-> original_pid); joins replace dict lookups. */
  def translate(ranking: DataFrame, mapping: DataFrame): DataFrame =
    ranking.join(mapping, "doc_id")
      .select(col("qid"), col("new_doc_id").as("doc_id"), col("rank"), col("score"))

  /** Split one ranking by disjoint query sets (reference
    * utility/rankings/split_by_queries.py:12-52: one output file per
    * queries file, every ranking line routed by its qid). Returns one
    * ranking per input set, in order. The reference's two asserts are
    * kept: a qid claimed by TWO sets is an error, and a ranking qid
    * covered by NO set is an error (its qid_to_file_idx lookup would
    * KeyError). Query sets are query-scale (not corpus-scale), so the
    * routing table broadcasts; the routed join is PERSISTED (rankings
    * are k rows per query — small by this module's contract) so the
    * coverage check and every returned frame share one execution of the
    * ranking plan instead of re-running a possibly expensive search per
    * set. The persist lives until the session drops it — long-lived
    * sessions doing MANY splits should use [[withSplitByQueries]], which
    * releases the shared frame after use. */
  def splitByQueries(ranking: DataFrame, querySets: Seq[DataFrame]): Seq[DataFrame] =
    splitRouted(ranking, querySets)._2

  /** [[splitByQueries]] with a bounded persist lifetime: applies `use`
    * to the split rankings, then unpersists their shared routed parent —
    * the splits must not escape `use` (their cache backing is released).
    * ADVICE r4: the plain variant leaks one persisted ranking copy per
    * call on the success path. */
  def withSplitByQueries[T](ranking: DataFrame, querySets: Seq[DataFrame])
                           (use: Seq[DataFrame] => T): T = {
    val (routed, splits) = splitRouted(ranking, querySets)
    try use(splits)
    finally { routed.unpersist(blocking = false); () }
  }

  private def splitRouted(ranking: DataFrame,
                          querySets: Seq[DataFrame]): (DataFrame, Seq[DataFrame]) = {
    require(querySets.nonEmpty, "at least one query set required")
    val tagged = querySets.zipWithIndex
      .map { case (q, i) =>
        q.select(col("qid")).distinct().withColumn("set_idx", lit(i))
      }
      .reduce(_ unionByName _)
    val dups = tagged.groupBy(col("qid")).count().filter(col("count") > 1).count()
    require(dups == 0, s"$dups qids appear in more than one query set")
    val routed = ranking.join(broadcast(tagged), Seq("qid"), "left").persist()
    val uncovered = routed.filter(col("set_idx").isNull).count()
    if (uncovered != 0) {
      routed.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"requirement failed: $uncovered ranking rows carry qids in no query set")
    }
    (routed, querySets.indices.map(i => routed.filter(col("set_idx") === i).drop("set_idx")))
  }

  /** Qrels 4-col TSV `qid 0 doc_id rel`, deduplicated (loaders.py:48-49). */
  def readQrelsTsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField("qid", LongType), StructField("_zero", IntegerType),
        StructField("doc_id", LongType), StructField("_rel", IntegerType))))
      .option("sep", "\t").csv(path)
      .select(col("qid"), col("doc_id"))
      .dropDuplicates("qid", "doc_id")
}
