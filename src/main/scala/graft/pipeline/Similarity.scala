package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (array<float>) — the vector side of the training-data pipeline,
  * and the literal analog of the reference's dense retrieval: brute-force
  * cosine = exhaustive MaxSim-style scoring, IVF-partitioned search = the
  * reference's centroid-probed candidate generation
  * (colbert/search/candidate_generation.py:45-64, IVF at
  * colbert/indexing/utils.py:8-64).
  *
  * Scale design: brute force is the correctness baseline (O(Q·N·d), fine
  * for reranking shortlists); the IVF path clusters vectors into buckets
  * (nearest of k data-derived centroids), probes only `nprobe` buckets per
  * query → candidate set shrinks by ~k/nprobe, with the centroid table
  * broadcast exactly like the BM25 df/avgdl stats. All arithmetic in
  * double, summed in ascending element order (aggregate HOF) — portable
  * to the oracle bit-for-bit before rounding.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in element order, as double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact cosine top-k neighbors for the query vectors
    * `queryIds` (self excluded): (qid, vec_id, rank, sim). The tiny query
    * side is broadcast; every vector is scored once — the exhaustive
    * baseline every ANN variant is validated against. */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = broadcast(
      emb.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb")))
    val scored = emb.crossJoin(queries)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** Data-derived coarse quantizer: per-label mean vector (k = #labels
    * centroids). Computed relationally (posexplode → per-(label, dim)
    * mean) so the oracle can reproduce it exactly. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("d"), col("m")))),
        e => e.getField("m")).as("centroid"))

  /** Assign each vector to its nearest centroid by cosine (ties → lower
    * label). The IVF bucket column. Centroids are broadcast. */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame = {
    val s2 = emb.crossJoin(broadcast(centroids.select(col("label").as("c_label"), col("centroid"))))
      .select(col("vec_id"), col("embedding"), col("c_label"),
        cosine(col("embedding"), col("centroid")).as("c_sim"))
    // rank on ROUNDED sims: double kernels in different engines agree to
    // ~1 ulp, so ordering on round(·, 6) + integer tiebreak is the same
    // everywhere, while raw-double ordering could flip near-ties.
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("c_sim"), 6).desc, col("c_label").asc)
    s2.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c_label").as("bucket"))
  }

  /** IVF-probed ANN top-k: queries probe their `nprobe` nearest centroids
    * and score only vectors in those buckets. Approximate by design —
    * recall vs [[bruteForceTopK]] is measured in tests; semantics (probe
    * order, tiebreaks) are fixed so the oracle matches exactly. */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, nprobe: Int = 2): DataFrame = {
    val centroids = labelCentroids(emb)
    val assigned = ivfAssign(emb, centroids)
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val probes = queries.crossJoin(broadcast(centroids.select(col("label").as("c_label"), col("centroid"))))
      .select(col("qid"), col("q_emb"), col("c_label"),
        cosine(col("q_emb"), col("centroid")).as("c_sim"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(round(col("c_sim"), 6).desc, col("c_label").asc)
    val probed = probes.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("q_emb"), col("c_label").as("bucket"))
    val scored = assigned.join(broadcast(probed), "bucket")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine ≥ τ),
    * blocked by IVF bucket: only same-bucket pairs are compared (the
    * standard near-dup blocking — candidates outside a bucket are assumed
    * dissimilar; recall measured in tests). Avoids the full O(N²) cross
    * join: cost is Σ_buckets m². */
  def embeddingNearDups(emb: DataFrame, threshold: Double): DataFrame = {
    val assigned = ivfAssign(emb, labelCentroids(emb))
    assigned.alias("a").join(assigned.alias("b"), "bucket")
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      .filter(round(col("sim"), 6) >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }
}
