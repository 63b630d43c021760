package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.Synthesizer
import graft.index.IndexBuilder
import graft.query.Bm25Search

/** Serving-path profiling probe (mirrors ScaleRunner's query measurement):
  * `runMain graft.ServeProbe [cpus] [nDocs]` builds (or reuses) a persisted
  * index under /tmp/graft-serve-probe-<nDocs>, then reports
  *   - 40-query batch searchPersisted wall time (min of 3)
  *   - single-query latencies + p50 over a warm SearchSession
  *   - Spark job count per single query (scheduling-overhead witness).
  * The index dir is intentionally NOT deleted so iteration is cheap.
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 32
    val nDocs = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-serve-probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"/tmp/graft-serve-probe-$nDocs"
    if (!graft.catalog.TableManifest.exists(IndexBuilder.stageDir(dir, "termstats"))) {
      println(s"PROBE building index at $dir ...")
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, Synthesizer.pages(spark, nDocs, 128), dir,
        auditExtraction = false)
      println(f"PROBE build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val index = IndexBuilder.open(spark, dir)
    val queries = Synthesizer.queries(spark, 40, nDocs)

    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet()
        val nTasks = js.stageInfos.map(_.numTasks).sum
        val desc = js.stageInfos.map(si => s"${si.name.takeWhile(_ != ' ')}x${si.numTasks}").mkString("+")
        jobStarts.put(js.jobId, (System.nanoTime(), nTasks, desc))
        ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStarts.remove(je.jobId)).foreach { case (t0, nTasks, desc) =>
          jobLog.add(f"job${je.jobId} ${(System.nanoTime() - t0) / 1e6}%.0fms tasks=$nTasks $desc")
        }
        ()
      }
    })

    val batch = (1 to 3).map { _ =>
      val t1 = System.nanoTime()
      Bm25Search.searchPersisted(queries, index, 10).count()
      (System.nanoTime() - t1) / 1e9
    }
    println(f"PROBE batch40 runs=${batch.map(b => f"$b%.2f").mkString(",")} min=${batch.min}%.2f s")

    import spark.implicits._
    val session = graft.query.SearchSession.open(spark, dir)
    val singles = Synthesizer.queries(spark, 11, nDocs).as[(Long, String)].collect().toSeq
    val lats = singles.map { case (_, text) =>
      val j0 = jobCounter.get()
      val s0 = System.nanoTime()
      session.searchOne(text, 10).count()
      val dt = (System.nanoTime() - s0) / 1e9
      (dt, jobCounter.get() - j0)
    }
    val sorted = lats.map(_._1).sorted
    println(f"PROBE p50=${sorted(sorted.size / 2)}%.3f s lats=${sorted.map(l => f"$l%.2f").mkString(",")}")
    println(s"PROBE jobs-per-query=${lats.map(_._2).mkString(",")}")
    // replay the LAST query with a drained job log for a per-job breakdown
    jobLog.clear()
    val tLast = System.nanoTime()
    session.searchOne(singles.last._2 + " freshsuffixterm", 10).count()
    println(f"PROBE last-query ${(System.nanoTime() - tLast) / 1e9}%.2f s job breakdown:")
    jobLog.forEach(l => println(s"PROBE   $l"))
    spark.stop()
  }
}
