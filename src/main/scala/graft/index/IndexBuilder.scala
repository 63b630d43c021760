package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.{HtmlExtract, Tokenizer}
import graft.catalog.TableManifest
import graft.query.Bm25IndexTables

/** Persisted, checkpoint-resumable index build over the pages table
  * (url, warc_ts, html, text, lang) — the Spark re-expression of the
  * reference's Indexer.index staged pipeline (colbert/indexer.py:58-80,
  * collection_indexer.py:61-78: setup → train → index → finalize), with
  * Iceberg-style commit semantics per stage instead of plan.json + chunk
  * files.
  *
  * Stages (each: Parquet write, then atomic manifest commit; a stage is
  * skipped on re-run iff its manifest exists AND its recorded parent
  * snapshot id matches the current parent — so editing an upstream stage
  * invalidates exactly its downstream chain):
  *
  *   docs        filter(lang/text) → byte-identity html⇄text audit →
  *               scalable dense docId assignment → corpus snapshot
  *   corpusstats (n_docs, avgdl, sum_dl) one-row table
  *   blocks      tokenize → (term, doc_id, tf) projection (zero-shuffle,
  *               never materialized: the shuffle files ARE the SPIMI
  *               runs — reference finalize's global code sort,
  *               collection_indexer.py:438-479) → delta+varint
  *               compressed posting blocks keyed by
  *               (term, block_no=doc_id/blockSpan) with block-max scores;
  *               the doc-range block key is the explicit skew salt: a
  *               stopword term's 10^11 postings become ~10^7 independent
  *               reduce keys (north-rule skew handling)
  *   termstats   (term, df, idf, max_tfnorm) — global WAND upper bounds,
  *               aggregated from the blocks table (vocabulary-sized)
  *
  * Scale notes: every stage is a single declarative plan (partial
  * aggregation + AQE apply); the only driver-side data are per-partition
  * counts (≤ numPartitions rows) for docId offsets and manifest lineage
  * from Parquet footers (no data scan).
  */
object IndexBuilder {

  case class BuildReport(stage: String, skipped: Boolean, rows: Long, snapshotId: Long,
                         seconds: Double = 0.0)

  val Stages = Seq("docs", "corpusstats", "blocks", "termstats")

  def stageDir(indexDir: String, stage: String): String = s"$indexDir/$stage"

  /** Frozen docId-assignment plan: sorted url range boundaries + each
    * range's cumulative row offset (both tiny: 4×partitions entries). */
  case class DocIdPlan(bounds: Array[org.apache.spark.unsafe.types.UTF8String],
                       offsets: Array[Long])

  /** Pass 1 of docId assignment (url-only, column-pruned): range-partition
    * the urls at 4×partitions granularity and capture, in ONE tiny
    * aggregation, each range's EXACT row count and lower boundary
    * (min url). The boundaries the range sampler actually chose are
    * frozen into the returned plan, so pass 2 re-derives the identical
    * order-preserving bucketing without re-sampling — re-executing
    * repartitionByRange samples nondeterministically per action, which
    * rounds 1-3 worked around with a full-row DISK_ONLY persist: at 32
    * cores that serialized the whole corpus through one disk (and never
    * unpersisted), and at 100 TB it would spill a corpus-sized
    * intermediate. Only the url column crosses this pass's exchange
    * (range sampling does re-execute the pass's SCAN once — that is the
    * partitioner's cost everywhere, and here the scan is the narrow
    * url+filter projection, not full rows). */
  def planDocIds(pages: DataFrame, partitions: Int): DocIdPlan = {
    val buckets = 4 * math.max(1, partitions)
    val parts = pages.select(col("url"))
      .repartitionByRange(buckets, col("url"))
      // evaluated AFTER the exchange (nondeterministic expressions are
      // never pushed through it): ranges are keyed by their physical
      // partition id, in key order by RangePartitioning's contract
      .select(col("url"), spark_partition_id().as("part"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("cnt"), min(col("url")).as("lo"))
      .collect()
      .sortBy(_.getInt(0))
    // bucket i = [lo_i, lo_{i+1}): equal keys share a partition, so the
    // observed minima exactly separate the ranges; empty ranges simply
    // produce no row. Partition 0's minimum is the global minimum (or
    // null if the lowest range is all-null urls) — never a boundary.
    val bounds = parts.drop(1).map { r =>
      org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(2))
    }
    val offsets = parts.map(_.getLong(1)).scanLeft(0L)(_ + _).dropRight(1)
    DocIdPlan(bounds, if (offsets.isEmpty) Array(0L) else offsets)
  }

  /** Pass 2: dense docId = global rank over url, in ONE full-row exchange.
    * bucket = binary search of url in the frozen boundaries (codegen'd
    * [[StringBucketExpr]]); doc_id = the bucket's cumulative offset
    * (element_at of a literal array — no join, no broadcast) + row_number
    * within the bucket. For unique urls the result is pure arithmetic on
    * the url's global rank: independent of sampling, physical partitioning
    * and parallelism. No persist, no RDD, no single-partition window (the
    * window keys on bucket — ~N/(4·partitions) rows per group, spillable). */
  def applyDocIds(pages: DataFrame, plan: DocIdPlan): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(col("url"))
    pages
      .withColumn("__bucket",
        coalesce(StringBucket.bucket(col("url"), plan.bounds), lit(0)))
      .withColumn("doc_id",
        element_at(typedLit(plan.offsets.toSeq), col("__bucket") + 1) +
          row_number().over(w) - 1)
      .drop("__bucket")
  }

  /** Single-decode docId assignment for builds with NO extraction audit
    * (the two-pass plan above re-decodes the text column once per pass to
    * apply the row filter — measurably slower when no audit scan exists to
    * carry pass 1): range-partition by url + sort within partitions (ONE
    * shuffle), doc_id = per-partition offset (tiny driver-side cumsum over
    * partition counts) + intra-partition position. The sorted Dataset is
    * persisted so the counts job and the assignment job see identical
    * (nondeterministically sampled) range boundaries — and a partition
    * lost AFTER the counts job recomputes through the SAME physical plan
    * instance, whose RangePartitioner (boundaries sampled once at plan
    * execution) and within-partition sort are frozen, so recovered rows
    * land in identical (pid, local) slots — MEMORY_AND_DISK_SER
    * by default: it spills to local disk exactly when the corpus slice
    * doesn't fit the executors' storage memory, and when it does fit it
    * skips the disk round-trip entirely (the local disk is the one
    * resource that does NOT grow with core count, so forcing DISK_ONLY
    * made the docs stage the build's worst scaler — measured 0.38
    * stage efficiency 8→32 cores, vs 0.73 for the shuffle-bound blocks
    * stage). Returns (ids, persist handle) — the caller MUST unpersist
    * the handle once the ids are consumed. */
  def assignDocIdsPersisted(pages: DataFrame, partitions: Int,
                            storage: org.apache.spark.storage.StorageLevel =
                              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
                           : (DataFrame, DataFrame) = {
    val sorted = pages
      .repartitionByRange(partitions, col("url"))
      .sortWithinPartitions(col("url"))
      .withColumn("mid", monotonically_increasing_id())
      .withColumn("pid", shiftright(col("mid"), 33).cast("int"))
      .withColumn("local", col("mid").bitwiseAND(lit((1L << 33) - 1)))
      .persist(storage)
    val counts = sorted.groupBy(col("pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + counts(p)).dropRight(1)).toMap
    val spark = pages.sparkSession
    val offsetDf = broadcast(
      spark.createDataFrame(offsets.toSeq.map { case (p, o) => (p, o) })
        .toDF("pid", "offset"))
    val ids = sorted
      .join(offsetDf, "pid")
      .withColumn("doc_id", col("offset") + col("local"))
      .drop("mid", "pid", "local", "offset")
    (ids, sorted)
  }

  /** Dense docId = global rank over url — [[planDocIds]] + [[applyDocIds]]
    * (the leak-free two-pass form; [[build]] picks this or the persisted
    * single-decode form depending on whether an audit scan exists to
    * carry pass 1). */
  def assignDocIds(pages: DataFrame, partitions: Int): DataFrame =
    applyDocIds(pages, planDocIds(pages, partitions))

  private def configOf(p: Bm25Params): Map[String, String] = Map(
    "k1" -> p.k1.toString, "b" -> p.b.toString,
    "block_span" -> p.blockSpan.toString,
    "term_id_seed" -> p.termIdSeed.toString,
    "term_buckets" -> p.termBuckets.toString,
    "tokenizer" -> "lower;split=[^\\p{L}\\p{Nd}]+;doc_max=220;query_max=32",
    "lang_filter" -> "en", "format" -> "parquet+graft-manifest-v1")

  /** Run one stage: skip if committed against the current parent snapshot,
    * else compute → write → manifest-commit.
    *
    * `configAfter`: extra manifest entries evaluated AFTER the write —
    * audit RESULTS observed during the write job (e.g. the extraction
    * mismatch count), as opposed to build PARAMS. Skip-equality compares
    * params only: a stored manifest matches when every param key agrees
    * (post-hoc result keys in the stored config are ignored). */
  private def runStage(spark: SparkSession, indexDir: String, stage: String,
                       parentSnapshot: Long, config: Map[String, String],
                       partitionCols: Seq[String] = Seq.empty,
                       configAfter: () => Map[String, String] = () => Map.empty)
                      (compute: => DataFrame): BuildReport = {
    val dir = stageDir(indexDir, stage)
    if (TableManifest.exists(dir)) {
      val m = TableManifest.read(dir)
      if (m.parentSnapshotId == parentSnapshot &&
          config.forall { case (k, v) => m.config.get(k).contains(v) } &&
          m.config.keySet.subsetOf(config.keySet ++ AfterKeys))
        return BuildReport(stage, skipped = true, m.rows, m.snapshotId)
    }
    val t0 = System.nanoTime()
    val writer = compute.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dir)
    val lineage = TableManifest.lineageOf(spark, dir)
    val m = TableManifest(stage, parentSnapshot, lineage.map(_.rows).sum, lineage,
      config ++ configAfter())
    TableManifest.commit(dir, m)
    BuildReport(stage, skipped = false, m.rows, m.snapshotId, (System.nanoTime() - t0) / 1e9)
  }

  /** Manifest keys that are post-write audit results, not build params. */
  private val AfterKeys = Set("extract_mismatches")

  /** Defensive Observation read: a metrics row can be absent entirely
    * when the optimizer collapses a degenerate (empty) observed subtree. */
  private def obsLong(obs: org.apache.spark.sql.Observation, key: String): Long =
    obs.get.get(key).flatMap(Option(_)).fold(0L)(_.asInstanceOf[Long])

  /** Full build. `pages` must have (url, warc_ts, html, text, lang);
    * docs whose html does not extract byte-identically to `text` are
    * counted into the docs manifest (config key `extract_mismatches`) —
    * the input_hint invariant, audited at build time. */
  def build(spark: SparkSession, pages: DataFrame, indexDir: String,
            p: Bm25Params = Bm25Params(), partitions: Int = 0,
            auditExtraction: Boolean = true, docIdOffset: Long = 0L): Seq[BuildReport] = {
    val parts = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val baseCfg = configOf(p) + ("doc_id_offset" -> docIdOffset.toString)
    val reports = scala.collection.mutable.ArrayBuffer[BuildReport]()

    // -- docs -------------------------------------------------------------
    val docsDir = stageDir(indexDir, "docs")
    val filtered = pages
      .filter(col("lang") === "en" && length(col("text")) > 0)
    // corpus stats AND the html⇄text byte-identity audit are OBSERVED
    // inside the docs write job itself (zero extra passes — at 10^12 docs
    // each fold deletes a full table scan from every build; the audit used
    // to be a SEPARATE job re-reading html, the table's widest column, end
    // to end). html is decoded exactly once, in the write job's scan, and
    // pruned before the docId exchange; the mismatch count is a post-write
    // audit RESULT recorded into the manifest by configAfter, not a build
    // param (resume keeps the recorded value). The one-row corpusstats
    // table is then written from the observed values — exact longs, so
    // the derived avgdl is identical to an aggregation over the table.
    val docsObs = org.apache.spark.sql.Observation()
    val auditObs = org.apache.spark.sql.Observation()
    var docsPersist: Option[DataFrame] = None
    val docsReport = runStage(spark, indexDir, "docs", 0L, baseCfg,
      configAfter = () =>
        if (auditExtraction) Map("extract_mismatches" -> obsLong(auditObs, "mm").toString)
        else Map.empty) {
      val narrow =
        if (!auditExtraction)
          filtered.select(col("url"), col("warc_ts"), col("text"), col("lang"))
        else
          filtered.select(col("url"), col("warc_ts"), col("text"), col("lang"),
            not(HtmlExtract.html_extract(col("html")) <=> col("text"))
              .cast("long").as("__mm"))
            .observe(auditObs, sum(col("__mm")).as("mm"))
            .drop("__mm")
      val withIds =
        if (auditExtraction) applyDocIds(narrow, planDocIds(filtered, parts))
        else {
          // the two-pass plan trades a second decode of the filter
          // columns for the persist; without an audit the single-decode
          // persisted form is measurably cheaper (DocIdProbe @600k docs:
          // 1.96 vs 2.20 s at 8 cores, 1.70 vs 2.68 s at 32 — the extra
          // text re-read costs more than the narrow-row persist until
          // the persist itself no longer fits local disk). Unpersisted
          // right after the write.
          val (ids, handle) = assignDocIdsPersisted(narrow, parts)
          docsPersist = Some(handle)
          ids
        }
      withIds
        .select((col("doc_id") + docIdOffset).as("doc_id"),
          col("url"), col("warc_ts"), col("text"), col("lang"),
          size(Tokenizer.tokenizeDoc(col("text"))).as("dl"))
        .observe(docsObs, count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    }
    reports += docsReport
    docsPersist.foreach(_.unpersist(blocking = false))
    val docs = spark.read.parquet(docsDir)

    // -- corpusstats ------------------------------------------------------
    val statsReport = runStage(spark, indexDir, "corpusstats", docsReport.snapshotId, baseCfg) {
      if (docsReport.skipped)
        // resume: the docs write didn't run this build, so no observation
        // exists — aggregate the committed table (docs-narrow, rare path)
        Bm25Index.corpusStats(docs.select(col("doc_id"), col("dl")))
      else {
        val n = obsLong(docsObs, "n_docs")
        val sumDl = obsLong(docsObs, "sum_dl")
        import spark.implicits._
        Seq((n, sumDl)).toDF("n_docs", "sum_dl")
          .select(col("n_docs"),
            // NULL avgdl on an empty corpus (ANSI mode makes /0 throw);
            // matches avg() over zero rows in the aggregated fallback
            when(col("n_docs") === 0, lit(null).cast("double"))
              .otherwise(col("sum_dl").cast("double") / col("n_docs")).as("avgdl"),
            col("sum_dl"))
      }
    }
    reports += statsReport
    val corpus = spark.read.parquet(stageDir(indexDir, "corpusstats"))

    // -- postings: ZERO-shuffle narrow projection --------------------------
    // tf is counted per document by the term_counts expression, so this
    // stage is a scan-speed map with no exchange at all. The postings
    // table is an intermediate (the query path probes only the sorted
    // blocks table), so no sorted layout is needed here — the one shuffle
    // of the build is the blocks stage's repartition by (term, block_no),
    // whose docId-range component is the explicit stopword-skew salt.
    // -- blocks -----------------------------------------------------------
    val blocksParent = TableManifest.snapshotId("chain", docsReport.snapshotId,
      statsReport.snapshotId, Seq.empty, Map.empty)
    // an EMPTY corpus writes the flat layout even when buckets are
    // requested: a partitioned write of zero rows leaves no schema-bearing
    // file behind, so the committed table could not be re-opened (open()
    // tolerates the downgrade — it enables bucket pruning only when the
    // read-back table actually carries the partition column)
    val bucketed = p.termBuckets > 0 &&
      corpus.select(col("n_docs")).head.getLong(0) > 0L
    val blocksReport = runStage(spark, indexDir, "blocks", blocksParent, baseCfg,
        partitionCols = if (bucketed) Seq("bucket") else Seq.empty) {
      // The raw postings NEVER materialize: the tokenize → term_counts →
      // explode projection feeds the blocks exchange directly, so the
      // build's largest intermediate exists only as shuffle files —
      // Spark's external sort IS the SPIMI run-write/merge
      // (collection_indexer.py's per-chunk codes→merge). Persisting it
      // as a table would double the biggest write+read of the build
      // (petabyte-class at 10^12 docs) to buy nothing: a blocks-stage
      // failure resumes from the committed docs table.
      //
      // The groupBy inside Bm25Index.blocksAgg already hash-partitions on
      // (term_id, block_no) — an explicit repartition here would be a
      // SECOND full exchange of the encoded blocks for the same layout.
      // Only the within-partition sort is added, so parquet row groups
      // are clustered by term_id for query-time min/max pruning.
      //
      // The fused-aggregate variant (postings buffered in primitive
      // arrays, varint partial buffers) needs avgdl as a driver value —
      // one row off the committed corpusstats stage. avgdl is NULL when
      // the filtered corpus is empty (sum_dl/0): an empty build must
      // still commit an empty blocks table (supported everywhere else —
      // e.g. maxDocId's coalesce), and with zero postings the value is
      // never used, so any finite stand-in is correct.
      val avgdlRow = corpus.select(col("avgdl")).head
      val avgdl = if (avgdlRow.isNullAt(0)) 1.0 else avgdlRow.getDouble(0)
      val encoded = Bm25Index.blocksAgg(Bm25Index.postingsWithDl(docs), avgdl, p)
      if (bucketed)
        // Bucketed layout (opt-in, p.termBuckets > 0): hive-partition the
        // table by bucket = pmod(term_id, B) so a query probe prunes whole
        // DIRECTORIES (partition pruning) before any footer is read — at
        // a 100 TB blocks table the flat layout still lists and
        // footer-reads every file just to apply row-group stats. HASH
        // repartition on bucket alone (NOT repartitionByRange: range
        // sampling re-executes the reduce side of the fused aggregate —
        // the same double-execution round 1 removed from the flat
        // layout): each task owns ≈B/parts WHOLE buckets → one writer
        // and one output file per bucket, no small-file explosion. Per-
        // bucket row counts are ~totalBlocks/B (term→bucket is a hash),
        // so the extra exchange is balanced; pick B ≥ write parallelism.
        // This one extra exchange of the compressed blocks is exactly
        // the cost that keeps the layout opt-in.
        encoded
          .withColumn("bucket", pmod(col("term_id"), lit(p.termBuckets)).cast("int"))
          .repartition(parts, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("term_id"), col("block_no"))
      else encoded.sortWithinPartitions(col("term_id"), col("block_no"))
    }
    reports += blocksReport

    // -- termstats (dictionary + df/idf + global block-max per term) ------
    // derived from the blocks table ALONE (df = Σ n, dictionary string on
    // the block rows): the postings table — the build's largest
    // intermediate — is scanned exactly once, by the blocks stage
    // The term-id injectivity audit rides the SAME aggregation as an
    // observed metric (collisions = term_ids whose min(term) ≠ max(term);
    // blocks carry the term string per block row, so every collision is
    // visible — see Bm25Index.blocks on why term is part of the group
    // key). A 64-bit hash collision would silently merge two posting
    // lists — fail fast and re-key with a different termIdSeed instead.
    // Folding the audit here deletes what used to be a SEPARATE full
    // blocks scan per build (and a distinct-aggregate Expand at that).
    val tsObs = org.apache.spark.sql.Observation()
    // vocabulary-sized aggregation: at full machine width the fixed
    // shuffle width buys only scheduling overhead (measured in the STAGES
    // probe: 0.37 s @8 → 0.65 s @32 with 32 reduce tasks on a ~100k-row
    // table — the stage REGRESSED with cores). Cap this stage's reduce
    // width at ~cores/4; the conf is scoped to the stage's one action and
    // restored immediately (the build owns the session while it runs).
    val termReport = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, math.max(4, parts / 4).toString)
      try runStage(spark, indexDir, "termstats", blocksReport.snapshotId, baseCfg) {
        // coalesce the MAP side too: the blocks table carries one file per
        // build partition, and one scan task per file on a vocabulary-
        // sized aggregate is pure scheduling overhead at full width (the
        // reduce cap alone measured 0.65 → 0.43 s @32, still above @8's
        // 0.31). Coalesce keeps partial aggregation per (merged) partition
        // and scales with the configured width on a real cluster.
        val blocks = spark.read.parquet(stageDir(indexDir, "blocks"))
          .coalesce(math.max(4, parts / 4))
        Bm25Index.termStatsFromBlocks(blocks, corpus, audit = Some(tsObs))
      } finally spark.conf.set(key, prev)
    }
    reports += termReport
    if (!termReport.skipped) {
      val collisions = obsLong(tsObs, "collisions")
      require(collisions == 0L,
        s"term-id hash collision ($collisions colliding ids) at seed " +
          s"${p.termIdSeed}: rebuild with a different Bm25Params.termIdSeed")
    }
    reports.toSeq
  }

  /** Open a committed index for querying. Fails fast if any stage manifest
    * is missing (partial build). On a bucketed layout (term_buckets > 0 in
    * the blocks manifest) the returned tables carry the bucket count so
    * query-time term probes add the partition-pruning bucket filter —
    * downgraded to 0 if the read-back table lacks the partition column
    * (empty-corpus builds fall back to the flat layout). */
  def open(spark: SparkSession, indexDir: String): Bm25IndexTables = {
    Stages.foreach { s =>
      require(TableManifest.exists(stageDir(indexDir, s)),
        s"index stage '$s' not committed at $indexDir")
    }
    val blocks = spark.read.parquet(stageDir(indexDir, "blocks"))
    val buckets = TableManifest.read(stageDir(indexDir, "blocks"))
      .config.getOrElse("term_buckets", "0").toInt
    Bm25IndexTables(
      blocks = blocks,
      termStats = spark.read.parquet(stageDir(indexDir, "termstats")),
      corpusStats = spark.read.parquet(stageDir(indexDir, "corpusstats")),
      termBuckets = if (blocks.columns.contains("bucket")) buckets else 0)
  }

  /** Stage manifests, in build order (for lineage reporting / tests). */
  def manifests(indexDir: String): Seq[TableManifest] =
    Stages.filter(s => TableManifest.exists(stageDir(indexDir, s)))
      .map(s => TableManifest.read(stageDir(indexDir, s)))
}
