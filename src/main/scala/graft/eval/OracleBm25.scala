package graft.eval

import graft.analysis.Tokenizer
import graft.index.Bm25Params

/** Exhaustive in-memory BM25 scorer — no Spark, no pruning, no
  * compression. The rank-identity oracle of SURVEY §5 item 3 (lexical
  * analog of the reference's e2e Success@5 gate made exact,
  * colbert/tests/e2e_test.py:41-80).
  *
  * Scores are summed in the ENGINE'S canonical order — ascending 64-bit
  * term id (the engine sorts struct(term_id, partial) before its fold,
  * Bm25Search.scores) — so equality holds BIT-FOR-BIT, not within
  * epsilon. Term-STRING order would differ from hash order on ≥3-term
  * docs and could drift by an ulp.
  */
object OracleBm25 {

  /** The engine's 64-bit term id (xxhash64, Bm25Index.termId) computed
    * driver-side: Spark's XxHash64 starts at seed 42 and chains the salt
    * int before the string bytes when termIdSeed != 0. */
  private def termIdOf(term: String, seed: Int): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    val s0 =
      if (seed == 0) 42L
      else org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(seed, 42L)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, s0)
  }

  /** (qid → ranked (docId, rank, score)), ties broken by docId asc. */
  def topK(docs: Seq[(Long, String)], queries: Seq[(Long, String)], k: Int,
           p: Bm25Params = Bm25Params()): Map[Long, Seq[(Long, Int, Double)]] = {
    val toks: Seq[(Long, Array[String])] =
      docs.map { case (id, t) => id -> Tokenizer.tokenize(t, Tokenizer.DocMaxTerms) }
    val n = docs.size.toLong
    val avgdl = toks.map(_._2.length.toLong).sum.toDouble / n
    // tf per (term, doc); df per term
    val tf = scala.collection.mutable.HashMap.empty[(String, Long), Int]
    val dl = scala.collection.mutable.HashMap.empty[Long, Int]
    toks.foreach { case (id, ts) =>
      dl(id) = ts.length
      ts.foreach(t => tf((t, id)) = tf.getOrElse((t, id), 0) + 1)
    }
    val df = tf.keys.groupBy(_._1).map { case (t, ks) => t -> ks.size.toLong }
    // StrictMath.log: Spark's Log expression uses StrictMath (Math.log's
    // intrinsic may differ by 1 ulp) — required for bit-exact equality.
    def idf(t: String): Double = StrictMath.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)

    queries.map { case (qid, qtext) =>
      val qterms = Tokenizer.tokenize(qtext, Tokenizer.QueryMaxTerms)
        .groupBy(identity).map { case (t, o) => t -> o.length }
        .filter { case (t, _) => df.contains(t) }
        .toSeq.sortBy(_._1) // canonical term order
      val scores = scala.collection.mutable.HashMap.empty[Long, Double]
      // accumulate per doc in canonical term order → deterministic sum
      val perDoc = scala.collection.mutable.HashMap.empty[Long, List[(String, Double)]]
      qterms.foreach { case (t, qtf) =>
        docs.foreach { case (id, _) =>
          tf.get((t, id)).foreach { f =>
            val tfn = f * (p.k1 + 1.0) /
              (f + p.k1 * ((1.0 - p.b) + p.b * dl(id) / avgdl))
            val partial = qtf * idf(t) * tfn
            perDoc(id) = (t, partial) :: perDoc.getOrElse(id, Nil)
          }
        }
      }
      perDoc.foreach { case (id, ps) =>
        scores(id) = ps.sortBy { case (t, _) => termIdOf(t, p.termIdSeed) }
          .foldLeft(0.0) { case (acc, (_, s)) => acc + s }
      }
      val ranked = scores.toSeq
        .sortBy { case (id, s) => (-s, id) }
        .take(k)
        .zipWithIndex
        .map { case ((id, s), i) => (id, i + 1, s) }
      qid -> ranked
    }.toMap
  }
}
