package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.corpus.Synthesizer

/** Training-data pipeline operators: planted duplicates must be found by
  * every dedup method; similarity search must agree with a naive local
  * recomputation. (Value-level parity with DuckDB is covered by the
  * driver-style oracle run; these tests pin the SEMANTICS on corpora with
  * known structure.) */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 120 base docs + planted exact clones (300+i ~ i) and near-clones with
    * one token appended (400+i ~ i). */
  private lazy val docs = {
    val base = Synthesizer.withDocIds(Synthesizer.pages(spark, 120, 4))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val exactClones = base.take(10).map { case (id, t) => (300L + id, t) }
    // PREpend the edit: appending can vanish under the 220-token doc
    // truncation, turning a "near" clone into an exact one
    val nearClones = base.take(10).map { case (id, t) => (400L + id, "extraword " + t) }
    (base ++ exactClones ++ nearClones).toDF("doc_id", "text").cache()
  }

  test("exact dedup finds exactly the planted clone groups") {
    val dups = Dedup.exactDups(docs)
      .select(col("doc_id"), col("canon_id")).as[(Long, Long)].collect().toSet
    val expected = (0L until 10L).flatMap(i => Seq((i, i), (300L + i, i))).toSet
    assert(dups == expected)
  }

  test("minhash LSH finds planted near-clones (1-token edit)") {
    val pairs = Dedup.minhashPairs(docs)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    (0L until 10L).foreach { i =>
      assert(pairs.contains((i, 300L + i)), s"exact clone pair $i missing")
      assert(pairs.contains((i, 400L + i)), s"near clone pair $i missing")
    }
  }

  test("n-gram jaccard scores planted pairs high and is symmetric-complete") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    (0L until 10L).foreach { i =>
      assert(pairs.get((i, 300L + i)).contains(1.0), s"exact clone $i should have J=1")
      assert(pairs.getOrElse((i, 400L + i), 0.0) > 0.8, s"near clone $i should have J>0.8")
    }
  }

  test("simhash: exact clones have distance 0; pairs respect the hamming bound") {
    val res = Dedup.simhashPairs(docs).as[(Long, Long, Int)].collect()
    val asMap = res.map(r => (r._1, r._2) -> r._3).toMap
    (0L until 10L).foreach { i =>
      assert(asMap.get((i, 300L + i)).contains(0), s"exact clone $i distance != 0")
    }
    assert(res.forall(_._3 <= 3))
  }

  test("jaccard df cap drops boilerplate shingles from candidates AND counts") {
    // every doc shares the same boilerplate prefix; each pair also shares
    // nothing rare — with the cap at 1 every shared shingle exceeds df=1
    // and no pair can form; with a high cap the clones score J=1
    val withCap = Dedup.ngramJaccardPairs(docs, threshold = 0.5, maxShingleDf = 1)
    assert(withCap.count() == 0L, "df<=1 shingles can never be shared by a pair")
    val noCap = Dedup.ngramJaccardPairs(docs, threshold = 0.5, maxShingleDf = 1000000)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    (0L until 10L).foreach(i => assert(noCap.contains((i, 300L + i))))
  }

  test("bounded collect: an over-cap bucket drops without truncating survivors") {
    // one boilerplate cluster of 40 clones (every band bucket overflows a
    // cap of 8) plus one small cluster of 3 clones: the big cluster must
    // vanish entirely while the small one still yields ALL 3 of its pairs
    // — i.e. the capped buffer never truncates a SURVIVING bucket.
    val rows =
      (0L until 40L).map(i => (i, "alpha beta gamma delta epsilon zeta eta theta")) ++
      (100L until 103L).map(i => (i, "iota kappa lambda mu nu xi omicron pi rho"))
    val d = rows.toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(d, maxBucket = 8)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L), (100L, 102L), (101L, 102L)))
  }

  test("hash sampling/mixing: deterministic, rate-accurate, shuffle-free") {
    import java.security.MessageDigest
    val n = 4000L
    val rows = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("src"), (col("id") % 4).cast("string")).as("source"))
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1) // src3 dropped
    val mixed = Sampling.mixBySource(rows, col("source"), col("doc_id"), rates, "t-seed")
    val got = mixed.select(col("doc_id"), col("source")).as[(Long, String)].collect().toSet

    // parity with a local md5 recomputation of the same rule
    val md = MessageDigest.getInstance("MD5")
    def hex8(s: String) =
      md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    val want = (0L until n).flatMap { id =>
      val src = s"src${id % 4}"
      rates.get(src).collect {
        case r if r >= 1.0 || hex8(s"t-seed|$id") < Sampling.hexThreshold(r) => (id, src)
      }
    }.toSet
    assert(got == want, "mix disagrees with local md5 recomputation")

    // rates hold to a few percent at n=1000/source
    val bySrc = got.groupBy(_._2).view.mapValues(_.size.toDouble / (n / 4)).toMap
    assert(bySrc("src0") == 1.0)
    assert(math.abs(bySrc("src1") - 0.5) < 0.05, s"src1 rate ${bySrc("src1")}")
    assert(math.abs(bySrc("src2") - 0.1) < 0.03, s"src2 rate ${bySrc("src2")}")
    assert(!bySrc.contains("src3"), "unconfigured source must drop")

    // identical selection at any parallelism, and a pure narrow plan
    val again = Sampling.mixBySource(rows.repartition(13), col("source"),
      col("doc_id"), rates, "t-seed").as[(Long, String)].collect().toSet
    assert(again == got)
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n${plan.take(500)}")
  }

  test("decontamination flags exactly the docs sharing benchmark shingles") {
    // benchmark = the 10 base docs that have exact clones planted at
    // 300+i and near-clones at 400+i: every clone shares (nearly) all
    // its trigrams with the benchmark and must be flagged; docs 10..119
    // are independent synthetic pages and must not be
    val bench = docs.filter(col("doc_id") < 10)
    val corpus = docs.filter(col("doc_id") >= 300)
    val flagged = Dedup.contaminated(corpus, bench, n = 3, minOverlap = 2)
      .select(col("doc_id"), col("overlap")).as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { i =>
      assert(flagged.contains(300L + i), s"exact clone ${300 + i} not flagged")
      assert(flagged.contains(400L + i), s"near clone ${400 + i} not flagged")
    }
    // overlap counts equal a local recomputation over distinct trigrams
    val shLocal = docs.select(col("doc_id"),
        Dedup.shingles(graft.analysis.Tokenizer.tokenizeDoc(col("text")), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap.view.mapValues(_.toSet)
    val benchSh = (0L until 10L).flatMap(shLocal(_)).toSet
    flagged.foreach { case (id, n) =>
      assert(n == shLocal(id).count(benchSh.contains), s"overlap mismatch for $id")
    }
    // scale shape: the benchmark side must broadcast (corpus shingles are
    // never shuffled by the probe join)
    val plan = Dedup.contaminated(corpus, bench).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("simhash bucket cap bounds candidate generation") {
    // maxBucket=1 leaves no bucket with >=2 members -> zero candidates
    assert(Dedup.simhashPairs(docs, maxBucket = 1).count() == 0L)
    // plans stay pair-bounded: the generator is a grouped collect, never a
    // bucket self-join re-evaluating the signature pipeline
    val plan = Dedup.simhashPairs(docs).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesianproduct"), plan.take(500))
  }

  test("trained IVF recall vs brute force is usable at nprobe=4") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val ivf = Similarity.ivfTopK(emb, qs, 10)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, qs, 10)
      .select(col("qid"), col("vec_id")).as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"IVF recall@10 vs brute (k=sqrt(N), nprobe=4): $recall%.3f")
    assert(recall >= 0.5, f"recall collapsed: $recall%.3f")
  }

  test("persisted IVF model round-trips and searches identically") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-model").toString
    try {
      Similarity.saveIvf(spark, emb, dir)
      val reopened = Similarity.openIvf(spark, dir)
      val qs = Seq(0L, 1L, 2L, 3L, 4L)
      val fresh = Similarity.ivfTopK(emb, qs, 10, 4, Similarity.trainedIvf(emb))
        .as[(Long, Long, Int, Double)].collect().toSet
      val persisted = Similarity.ivfTopK(emb, qs, 10, 4, reopened)
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(persisted == fresh,
        "persisted model must reproduce the fresh model's ranking exactly")
      // the manifests commit atomically — a partial write must not open
      val bad = java.nio.file.Files.createTempDirectory("graft-ivf-bad").toString
      assertThrows[IllegalArgumentException](Similarity.openIvf(spark, bad))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("embedding near-dups: every emitted pair verifies against local cosine") {
    val emb = (0 until 60).map { i =>
      // two planted near-identical vectors: 50 ≈ 0
      val base = Array.tabulate(8)(d => math.sin(i * 17 + d * 3).toFloat)
      (i.toLong, i % 5, if (i == 50) Array.tabulate(8)(d => math.sin(d * 3).toFloat * 1.001f) else base)
    }.toDF("vec_id", "label", "embedding")
    val got = Similarity.embeddingNearDups(emb, 0.999)
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 50L)), s"planted near-identical pair missing: $got")
  }

  test("brute-force ANN: ranks agree with a local exhaustive recomputation") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, i % 4, Array.tabulate(8)(d => math.cos(i * 31 + d * 7).toFloat))
    }
    val emb = vecs.toDF("vec_id", "label", "embedding")
    val got = Similarity.bruteForceTopK(emb, Seq(0L, 1L), 5)
      .select(col("qid"), col("vec_id"), col("rank")).as[(Long, Long, Int)]
      .collect().toSet

    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val byId = vecs.map(v => v._1 -> v._3).toMap
    val want = Seq(0L, 1L).flatMap { q =>
      vecs.filter(_._1 != q)
        .map(v => (v._1, cos(byId(q), v._3)))
        .sortBy { case (id, s) => (-math.rint(s * 1e6) / 1e6, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), r) => (q, id, r + 1) }
    }.toSet
    assert(got == want)
  }

  test("IVF ANN returns a subset of brute-force candidates with correct sims") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = Similarity.ivfTopK(emb, Seq(0L, 1L, 2L), 10)
      .select(col("qid"), col("vec_id"), col("sim")).as[(Long, Long, Double)].collect()
    val brute = Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L), 500)
      .select(col("qid"), col("vec_id"), col("sim")).as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (q, v, s) =>
      assert(brute.get((q, v)).contains(s), s"sim mismatch for ($q,$v)")
    }
  }
}
