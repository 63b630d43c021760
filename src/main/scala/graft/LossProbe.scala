package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.train.Training

/** Diagnostic: the loss reduction at VOLUME. The oracle gates 9 qids;
  * a real distillation epoch reduces losses for every query in the
  * training set at once, so the question is whether the exact-polynomial
  * chain (one groupBy + one wide projection of Horner expressions)
  * stays a codegen'd single-shuffle plan at millions of rows — or falls
  * out of whole-stage codegen (64KB JVM method limit) into interpreted
  * projection.
  *
  * Usage: runMain graft.LossProbe [nQids] [ways] [ibDocs]
  * Prints wall seconds for the reduction and whether the final plan
  * contains a WholeStageCodegen span over the loss projection.
  *
  * Measured (local[32], warm): 1M qids (4M nway + 8M ib rows) reduce in
  * 1.5 s — ~670k losses/s through ONE exchange. wholestage_codegen is
  * FALSE by Spark design, not by defect: array HOF lambdas
  * (transform/aggregate) are CodegenFallback, and sort_array over
  * collect_list forces ObjectHashAggregate — the stage cost is the
  * object agg plus a bounded per-row Horner evaluation, linear in batch
  * size and embarrassingly parallel across qids.
  */
object LossProbe {
  def main(args: Array[String]): Unit = {
    val nQids = args.headOption.map(_.toLong).getOrElse(1000000L)
    val ways = args.lift(1).map(_.toInt).getOrElse(4)
    val ibDocs = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-loss-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic scores on the 4-decimal grid (hash-derived)
    def grid(c: org.apache.spark.sql.Column) =
      floor((pmod(hash(c), lit(200000)).cast("double") / 10) + 0.5) / 10000
    val nway = spark.range(nQids * ways).select(
      (col("id") / ways).cast("long").as("qid"),
      pmod(col("id"), lit(ways)).cast("int").as("way"),
      grid(col("id") * 7).as("teacher"),
      grid(col("id") * 13).as("student"))
    val ib = spark.range(nQids * ibDocs).select(
      (col("id") / ibDocs).cast("long").as("qid"),
      pmod(col("id"), lit(ibDocs)).cast("long").as("doc_id"),
      grid(col("id") * 31).as("score"),
      when(pmod(col("id"), lit(ibDocs)) === 0, 1).otherwise(0).as("label"))

    val out = Training.losses(nway, ib)
    out.count() // warm: JIT + codegen compile
    val t0 = System.nanoTime()
    val n = out.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val plan = out.queryExecution.executedPlan.toString
    val codegen = plan.contains("*(")
    val exchanges = "Exchange".r.findAllIn(plan).size
    println(f"LOSSPROBE qids=$nQids ways=$ways ibDocs=$ibDocs rows=$n " +
      f"warm_sec=$sec%.2f rows_per_sec=${n / sec}%.0f " +
      s"wholestage_codegen=$codegen exchanges=$exchanges")
    spark.stop()
  }
}
