package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analysis.Tokenizer
import graft.corpus.Synthesizer
import graft.index.IndexBuilder

/** Head-to-head probe of the UNAUDITED docId-assignment strategies
  * (the audited build always takes the two-pass plan): for each cpu count
  * it times the full docs-stage write under
  *   A: assignDocIdsPersisted (range sort + DISK_ONLY persist + offset join)
  *   B: planDocIds + applyDocIds (url-only boundary pass + binary-search
  *      bucket + per-bucket row_number — re-reads the filter columns once)
  *   C: assignDocIdsPersisted at its default MEMORY_AND_DISK_SER — the
  *      build's production choice
  *   D: narrow url-only persist + ids joined back to the full rows by url
  *      (round-4 experiment: pays a second text decode + a full-row hash
  *      exchange; measured LOSING to C at both widths — see SCALE.md)
  * interleaving A/B/C/D per rep so episodic VM contention windows hit
  * every arm.
  * `runMain graft.DocIdProbe` with PROBE_DOCS / PROBE_CPUS / PROBE_REPS.
  */
object DocIdProbe {
  private def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files => F, Paths}
    val p = Paths.get(path)
    if (F.exists(p)) {
      import scala.jdk.CollectionConverters._
      F.walk(p).iterator().asScala.toSeq.reverse.foreach(F.deleteIfExists(_))
    }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "600000").toLong
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    for (cpus <- sys.env.getOrElse("PROBE_CPUS", "8,32").split(",").map(_.trim.toInt)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.shuffle.compress", "false")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val pagesDir = Files.createTempDirectory(s"docid-pages-$cpus").toString
      Synthesizer.pages(spark, n, 4 * cpus).write.mode("overwrite").parquet(pagesDir)

      def docsStage(strategy: String, outDir: String): Double = {
        val filtered = spark.read.parquet(pagesDir)
          .filter(col("lang") === "en" && length(col("text")) > 0)
        val narrow = filtered.select(col("url"), col("warc_ts"), col("text"), col("lang"))
        val t0 = System.nanoTime()
        var handle: Option[org.apache.spark.sql.DataFrame] = None
        val withIds = strategy match {
          case "A" =>
            val (ids, h) = IndexBuilder.assignDocIdsPersisted(narrow, cpus,
              org.apache.spark.storage.StorageLevel.DISK_ONLY)
            handle = Some(h); ids
          case "B" =>
            IndexBuilder.applyDocIds(narrow, IndexBuilder.planDocIds(filtered, cpus))
          case "C" =>
            val (ids, h) = IndexBuilder.assignDocIdsPersisted(narrow, cpus)
            handle = Some(h); ids
          case "D" =>
            // narrow persist: only urls ride the sort+persist; full rows
            // take ONE decode and ONE hash exchange (the id join)
            val sortedUrls = narrow.select(col("url"))
              .repartitionByRange(cpus, col("url"))
              .sortWithinPartitions(col("url"))
              .withColumn("mid", monotonically_increasing_id())
              .withColumn("pid", shiftright(col("mid"), 33).cast("int"))
              .withColumn("local", col("mid").bitwiseAND(lit((1L << 33) - 1)))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
            handle = Some(sortedUrls)
            val counts = sortedUrls.groupBy(col("pid")).count().collect()
              .map(r => r.getInt(0) -> r.getLong(1)).toMap
            val pids = counts.keys.toSeq.sorted
            val offsets = pids.zip(
              pids.scanLeft(0L)((acc, p) => acc + counts(p)).dropRight(1)).toMap
            val offsetDf = broadcast(
              spark.createDataFrame(offsets.toSeq).toDF("pid", "offset"))
            val ids = sortedUrls.join(offsetDf, "pid")
              .select(col("url"), (col("offset") + col("local")).as("doc_id"))
            narrow.join(ids, "url")
        }
        withIds
          .select(col("doc_id"), col("url"), col("warc_ts"), col("text"), col("lang"),
            size(Tokenizer.tokenizeDoc(col("text"))).as("dl"))
          .write.mode("overwrite").parquet(outDir)
        handle.foreach(_.unpersist(blocking = true))
        (System.nanoTime() - t0) / 1e9
      }

      // JIT/codegen warmup on a small slice of each strategy
      val warm = Files.createTempDirectory(s"docid-warm-$cpus").toString
      val strats = Seq("A", "B", "C", "D")
      strats.foreach(s => docsStage(s, warm))
      val times = scala.collection.mutable.Map(strats.map(_ -> List.empty[Double]): _*)
      val out = Files.createTempDirectory(s"docid-out-$cpus").toString
      for (r <- 1 to reps; s <- strats) {
        val t = docsStage(s, out)
        times(s) = times(s) :+ t
        println(f"DOCID cpus=$cpus rep=$r strat=$s sec=$t%.2f")
      }
      println(f"DOCID cpus=$cpus SUMMARY persisted_min=${times("A").min}%.2f " +
        f"twopass_min=${times("B").min}%.2f memdisk_min=${times("C").min}%.2f " +
        f"narrowjoin_min=${times("D").min}%.2f")
      spark.stop()
      Seq(pagesDir, warm, out).foreach(deleteRecursively)
    }
  }
}
