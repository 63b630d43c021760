package graft.query

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.Synthesizer
import graft.index.{Bm25Index, IndexBuilder}

/** Physical-plan quality gates — the shapes the engine's scale story
  * depends on, pinned so a refactor cannot silently regress them:
  * zero-shuffle postings, broadcast-only query joins, parquet term
  * pushdown, whole-stage codegen over the hot expressions. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private lazy val docs = Synthesizer.withDocIds(Synthesizer.pages(spark, 200, 3))
    .select(col("doc_id"), col("text")).cache()

  // a file-backed docs input: plan checks on the TRANSFORM itself must not
  // see exchanges belonging to the test fixture's docId window
  private lazy val fileDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def finalPlan(df: DataFrame): String = {
    df.count() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString
  }

  test("postings build is a narrow plan: no Exchange (zero-shuffle claim)") {
    val plan = finalPlan(Bm25Index.postingsWithDl(fileDocs))
    assert(!plan.contains("Exchange"), plan)
  }

  test("postings/tokenize pipeline runs inside WholeStageCodegen") {
    val plan = finalPlan(Bm25Index.postingsWithDl(fileDocs))
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan
    assert(plan.contains("*(1)"), plan)
    // the custom expressions must sit INSIDE the codegen'd stage (a
    // fallback would print them under a non-starred node)
    assert(plan.contains("*(1) Project [doc_id") || plan.contains("graft_tokenize"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("query-time scoring joins are broadcast (postings never shuffled by the join)") {
    val index = Bm25IndexTables.fromDocs(docs)
    val queries = Synthesizer.queries(spark, 10, 200)
    val plan = planOf(Bm25Search.searchFull(queries, index, 10))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"postings join degraded to SMJ:\n$plan")
  }

  test("persisted search pushes the query-term In filter into the parquet scan") {
    val dir = Files.createTempDirectory("graft-plan").toString
    IndexBuilder.build(spark, Synthesizer.pages(spark, 200, 3), dir, auditExtraction = false)
    val index = IndexBuilder.open(spark, dir)
    val queries = Synthesizer.queries(spark, 5, 200)
    val plan = planOf(Bm25Search.searchPersisted(queries, index, 10))
    // pushed on the 64-bit dictionary id (long), not the term string
    assert(plan.contains("PushedFilters: [In(term_id"), plan)
  }

  test("blocks build has exactly one data shuffle (the grouped block aggregation)") {
    val corpus = Bm25Index.corpusStats(Bm25Index.docStats(docs))
    val plan = planOf(Bm25Index.blocks(Bm25Index.postingsWithDl(docs), corpus,
      graft.index.Bm25Params()))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 hash exchange, got $shuffles:\n$plan")
  }

  test("tombstone anti-join: small set broadcasts, huge set does NOT") {
    import spark.implicits._
    val index = Bm25IndexTables.fromDocs(docs)
    val tombDf = Seq(1L, 2L, 3L).toDF("doc_id")
    val antiBroadcast = "BroadcastHashJoin .*LeftAnti".r
    val antiShuffled = "ShuffledHashJoin .*LeftAnti".r
    val small = index.copy(tombstones = Some(Tombstones(tombDf, 3L)))
    val smallPlan = planOf(small.decode(small.blocks))
    assert(antiBroadcast.findFirstIn(smallPlan).isDefined,
      s"small tombstone set should broadcast its anti-join:\n$smallPlan")
    // same data, manifest CLAIMS web-scale cardinality: the planner must
    // not be handed an unbounded broadcast (SCALE.md's knob, now code)
    val huge = index.copy(tombstones =
      Some(Tombstones(tombDf, Tombstones.BroadcastMaxRows + 1)))
    val hugePlan = planOf(huge.decode(huge.blocks))
    assert(antiBroadcast.findFirstIn(hugePlan).isEmpty &&
      antiShuffled.findFirstIn(hugePlan).isDefined,
      s"huge tombstone set must anti-join via shuffle, not broadcast:\n$hugePlan")
  }

  test("phrase verify tokenizes candidate docs only (tokenize above the candidate join)") {
    import spark.implicits._
    // persist the index tables (as every real caller does): their build
    // plans contain corpus tokenizes that would otherwise show up as
    // false positives below
    val raw = Bm25IndexTables.fromDocs(docs)
    val index = raw.copy(blocks = raw.blocks.persist(),
      termStats = raw.termStats.persist(), corpusStats = raw.corpusStats.persist())
    index.blocks.count(); index.termStats.count(); index.corpusStats.count()
    // driver-sized batch → the query side compiles on the driver, so the
    // ONLY graft_tokenize expressions left in the plan are doc-side
    val queries = Seq((1L, "w1 w2")).toDF("qid", "text")
    val df = Bm25Search.searchPhrase(queries, index, docs, 10)
    val opt = df.queryExecution.optimizedPlan
    val tokNodes = opt.collect {
      case p if p.expressions.exists(_.exists(_.prettyName == "graft_tokenize")) => p
    }
    assert(tokNodes.nonEmpty, s"no doc-side tokenize found:\n$opt")
    // every tokenize projection must consume the candidate join's output —
    // a tokenize applied directly over the bare corpus scan (no join
    // below it) means the physical plan re-tokenizes EVERY doc per phrase
    // batch (the round-3 bug)
    tokNodes.foreach { n =>
      val joinBelow = n.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joinBelow.nonEmpty,
        s"doc tokenize evaluated below the candidate join:\n$opt")
    }
    index.blocks.unpersist(); index.termStats.unpersist(); index.corpusStats.unpersist()
  }

  test("extraction spans probe the corpus once, tokenize above the result join") {
    import spark.implicits._
    val raw = Bm25IndexTables.fromDocs(docs)
    val index = raw.copy(blocks = raw.blocks.persist(),
      termStats = raw.termStats.persist(), corpusStats = raw.corpusStats.persist())
    index.blocks.count(); index.termStats.count(); index.corpusStats.count()
    val queries = Seq((1L, "w1 w2")).toDF("qid", "text")
    val ranking = Seq((1L, 5L, 1)).toDF("qid", "doc_id", "rank")
    val df = Bm25Search.searchExtractions(queries, index, fileDocs, 10,
      precomputedRanking = Some(ranking))
    val opt = df.queryExecution.optimizedPlan
    // ONE corpus scan: the r4 fix rides dl on the same exploded pass as
    // the spans — a separate dl frame re-executed the probe a second time
    val corpusScans = opt.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(corpusScans.size == 1, s"expected exactly 1 corpus scan:\n$opt")
    // the offsets tokenize must consume the ranking join's output — over
    // the bare scan it would tokenize EVERY doc per extraction call
    val tokNodes = opt.collect {
      case p if p.expressions.exists(_.exists(_.prettyName == "tokenize_with_offsets")) => p
    }
    assert(tokNodes.nonEmpty, s"no offsets tokenize found:\n$opt")
    tokNodes.foreach { n =>
      val joinBelow = n.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joinBelow.nonEmpty, s"offsets tokenize below the result join:\n$opt")
    }
    index.blocks.unpersist(); index.termStats.unpersist(); index.corpusStats.unpersist()
  }

  test("batch assembly hashes matched rows only (md5 above the corpus join)") {
    import spark.implicits._
    val triples = Seq((1L, 0, 5L, 8.0)).toDF("qid", "way", "doc_id", "score")
    val queries = Seq((1L, "spark merge")).toDF("qid", "text")
    val opt = graft.train.Training.assembleBatch(triples, queries, fileDocs)
      .queryExecution.optimizedPlan
    // any md5 whose subtree reaches the corpus scan must sit ABOVE a join
    // (Catalyst never defers a projection past a join, so an md5 in the
    // corpus-side projection digests every doc per batch — the r4 bug)
    val md5OverCorpus = opt.collect {
      case p if p.expressions.exists(_.exists(_.prettyName == "md5")) &&
        p.exists(_.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]) => p
    }
    assert(md5OverCorpus.nonEmpty, s"no corpus-side md5 found:\n$opt")
    md5OverCorpus.foreach { n =>
      val joinBelow = n.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joinBelow.nonEmpty, s"md5 computed below the corpus join:\n$opt")
    }
  }

  test("WAND stage B reads only ids + bounds (column pruning on the blocks scan)") {
    val dir = Files.createTempDirectory("graft-plan2").toString
    IndexBuilder.build(spark, Synthesizer.pages(spark, 200, 3), dir, auditExtraction = false)
    val blocks = IndexBuilder.open(spark, dir).blocks
    val ubScan = blocks
      .select(col("term_id"), col("block_max_tfnorm"),
        explode(graft.codec.VarintExpressions.delta_varint_decode(col("doc_ids_enc"))).as("doc_id"))
    val plan = planOf(ubScan)
    // tf/dl payloads must NOT be read for the upper-bound pass
    assert(!plan.contains("tfs_enc") && !plan.contains("dls_enc"),
      s"stage-B scan reads payload columns:\n$plan")
  }
}
