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
  * Coarse quantizer: k = ⌈√N⌉ DATA-DRIVEN centroids — every ⌊N/k⌋-th
  * vector seeds a cluster, refined by one Lloyd iteration (assign →
  * per-cluster mean → reassign). This is the k-means shape of the
  * reference (faiss k-means over a sample, collection_indexer.py:500-517,
  * with num_partitions ∝ √(16·N) at indexer settings) kept deterministic
  * and engine-portable so the DuckDB oracle reproduces it bit-for-bit.
  * k grows with N, so buckets stay ~√N-sized: the same-bucket work of
  * near-dup blocking and probed search scales as N^1.5 TOTAL (Σ m²,
  * m≈√N) instead of collapsing quadratic — and the per-bucket cap drops
  * pathological clusters (mirror of Dedup.maxBucket).
  *
  * Scale design: brute force is the correctness baseline (O(Q·N·d), fine
  * for reranking shortlists); the IVF path probes only `nprobe` buckets
  * per query → candidate set shrinks ~k/nprobe, with the k×d centroid
  * table broadcast exactly like the BM25 df/avgdl stats. All arithmetic
  * in double, summed in ascending element order (aggregate HOF) —
  * portable to the oracle before rounding; ordering always on
  * round(sim, 6) + integer tiebreak, because raw-double ordering can flip
  * near-ties between engines.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in element order, as double ([[DotProductExpr]] — codegen'd,
    * bit-identical to the aggregate/zip_with HOF it replaces). */
  def dot(a: Column, b: Column): Column = VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine with PRE-COMPUTED norms: dot(a,b)/(na·nb). Bit-identical to
    * [[cosine]] when na/nb were produced by [[norm]] — the point is to
    * evaluate each row's norm once per ROW instead of once per PAIR
    * (the N·k assignment and the per-bucket pair joins were recomputing
    * ~2/3 of their flops in redundant norms). */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Brute-force exact cosine top-k neighbors for the query vectors
    * `queryIds` (self excluded): (qid, vec_id, rank, sim). The tiny query
    * side is broadcast; every vector is scored once — the exhaustive
    * baseline every ANN variant is validated against. */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val queries = broadcast(
      emb.filter(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          norm(col("embedding")).as("q_n")))
    val scored = emb.withColumn("e_n", norm(col("embedding"))).crossJoin(queries)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosinePre(col("q_emb"), col("embedding"), col("q_n"), col("e_n")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** k for a corpus of n vectors: ⌈√n⌉ (faiss-style growth). */
  def kForCorpus(n: Long): Int =
    math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Deterministic seed sample: every `step`-th vec_id, as double
    * centroids keyed by the seed's vec_id. */
  def seedCentroids(emb: DataFrame, step: Long): DataFrame =
    emb.filter(col("vec_id") % step === 0)
      .select(col("vec_id").as("c_id"),
        transform(col("embedding"), x => x.cast("double")).as("centroid"))

  /** Nearest-centroid assignment by cosine: (vec_id, embedding, bucket).
    * Centroids (k ≈ √N rows) are broadcast; the winner per vector is a
    * grouped min over struct(−round(sim,6), c_id) — partial-aggregable,
    * no per-vector window sort. Ties → lower c_id. */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.withColumn("e_n", norm(col("embedding")))
      .crossJoin(broadcast(centroids.withColumn("c_n", norm(col("centroid")))))
      .select(col("vec_id"), col("embedding"), col("c_id"),
        cosinePre(col("embedding"), col("centroid"), col("e_n"), col("c_n")).as("c_sim"))
      .groupBy(col("vec_id"))
      .agg(
        min(struct((-round(col("c_sim"), 6)).as("ns"), col("c_id").as("c"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("m.c").as("bucket"))

  /** Per-cluster per-dimension mean of an assignment — the Lloyd update,
    * computed relationally (posexplode → avg) so the oracle matches. */
  def meanCentroids(assigned: DataFrame): DataFrame =
    assigned.select(col("bucket"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col("bucket"), col("d"))
      .agg(avg(col("v").cast("double")).as("m"))
      .groupBy(col("bucket"))
      .agg(transform(
        array_sort(collect_list(struct(col("d"), col("m")))),
        e => e.getField("m")).as("centroid"))
      .select(col("bucket").as("c_id"), col("centroid"))

  /** Training-sample stride: every `max(1, n/(16k))`-th vec_id, i.e. a
    * ~16·k-member deterministic sample (16 points per centroid — the
    * k-means sampling shape of the reference, which trains faiss on a
    * 16·√(120·N) passage sample, collection_indexer.py:114-131, instead
    * of the full corpus). */
  def sampleStepFor(n: Long, k: Int): Long = math.max(1L, n / (16L * k))

  /** Data-driven IVF: ⌈√N⌉ sampled seeds + one Lloyd refinement where the
    * cluster means are computed over the ~16k-member training SAMPLE, not
    * the corpus — so training costs O(16k·k·d) plus the ONE unavoidable
    * full-corpus assignment that IS the IVF index (the reference likewise
    * trains on a sample and then assigns every passage once,
    * collection_indexer.py:500-517). A previous version ran the Lloyd
    * mean over the full corpus, doubling the corpus passes per build.
    * Returns (centroids, assignment); both reused by search and blocking
    * — share ONE trained model across operators (see [[saveIvf]] and the
    * session cache in SparkEntry) instead of retraining per query. */
  def trainedIvf(emb: DataFrame): (DataFrame, DataFrame) = {
    val refined = trainCentroids(emb)
    (refined, assign(emb, refined))
  }

  /** The sample-trained centroid half of [[trainedIvf]] (k-row result). */
  def trainCentroids(emb: DataFrame): DataFrame = {
    val n = emb.count()
    val k = kForCorpus(n)
    val step = math.max(1L, n / k)
    val sample = emb.filter(col("vec_id") % sampleStepFor(n, k) === 0)
    meanCentroids(assign(sample, seedCentroids(emb, step)))
  }

  /** Persist a trained model as index tables (the analog of the
    * reference's centroids.pt + ivf.pid.pt written once at index time,
    * colbert/indexing/codecs/residual.py:150-165): `<dir>/centroids`,
    * `<dir>/assignment` parquet with committed manifests. */
  def saveIvf(spark: org.apache.spark.sql.SparkSession, emb: DataFrame,
              dir: String): Unit = {
    import graft.catalog.TableManifest
    // write the trained centroids FIRST, then derive the assignment from
    // the PERSISTED table: the assignment's lazy plan would otherwise
    // embed the unpersisted training chain and re-execute the whole
    // sample+Lloyd pipeline a second time for the second write
    trainCentroids(emb).write.mode("overwrite").parquet(s"$dir/centroids")
    val cl = TableManifest.lineageOf(spark, s"$dir/centroids")
    TableManifest.commit(s"$dir/centroids",
      TableManifest("ivf_centroids", 0L, cl.map(_.rows).sum, cl, Map.empty))
    assign(emb, spark.read.parquet(s"$dir/centroids"))
      .write.mode("overwrite").parquet(s"$dir/assignment")
    val al = TableManifest.lineageOf(spark, s"$dir/assignment")
    TableManifest.commit(s"$dir/assignment",
      TableManifest("ivf_assignment", cl.map(_.rows).sum, al.map(_.rows).sum, al, Map.empty))
  }

  /** Open a persisted model: (centroids, assignment). */
  def openIvf(spark: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, DataFrame) = {
    import graft.catalog.TableManifest
    require(TableManifest.exists(s"$dir/centroids") && TableManifest.exists(s"$dir/assignment"),
      s"no committed IVF model at $dir")
    (spark.read.parquet(s"$dir/centroids"), spark.read.parquet(s"$dir/assignment"))
  }

  /** IVF-probed ANN top-k: queries probe their `nprobe` nearest centroids
    * and score only vectors in those buckets. Approximate by design —
    * recall vs [[bruteForceTopK]] is measured in tests; semantics (probe
    * order, tiebreaks) are fixed so the oracle matches exactly. */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, nprobe: Int = 4): DataFrame =
    ivfTopK(emb, queryIds, k, nprobe, trainedIvf(emb))

  /** [[ivfTopK]] over an already-trained (and typically persisted/cached)
    * model — the production shape: train once, search many. */
  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, nprobe: Int,
              model: (DataFrame, DataFrame)): DataFrame = {
    val (centroids, assigned) = model
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("qid"), col("q_emb"), col("c_id"),
        cosine(col("q_emb"), col("centroid")).as("c_sim"))
    val wp = Window.partitionBy(col("qid"))
      .orderBy(round(col("c_sim"), 6).desc, col("c_id").asc)
    val probed = probes.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("q_emb"), col("c_id").as("bucket"))
    val scored = assigned.withColumn("e_n", norm(col("embedding")))
      .join(broadcast(probed.withColumn("q_n", norm(col("q_emb")))), "bucket")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosinePre(col("q_emb"), col("embedding"), col("q_n"), col("e_n")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** Hyperplane-LSH ANN top-k — the training-free bucketed scale path
    * next to [[ivfTopK]] (which needs a trained model): every vector gets
    * `tables` sign-projection bucket ids from ONE fused map-phase pass
    * ([[LshSignature]]), queries probe all their tables' buckets, and
    * only same-(table, bucket) candidates are scored. Approximate by
    * design (a cosine-near neighbor agrees on each sign bit w.p. 1−θ/π;
    * `tables` OR-ed probes recover the tail) — recall vs
    * [[bruteForceTopK]] is measured in tests; bucketing and tiebreaks are
    * exact integer math so the oracle matches bit-for-bit.
    *
    * Scale shape: the bucket table is N·tables rows built map-side (no
    * training job, unlike IVF); the tiny query side broadcasts, so
    * candidate generation is a map-side semi-probe and the only shuffle
    * is the groupBy over candidate rows (Q·tables·bucket-size, never N). */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
              tables: Int = 4, bits: Int = 6): DataFrame = {
    val scored = lshCandidateRows(emb, queryIds, tables, bits)
      .select(col("qid"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(round(col("sim"), 6).desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), round(col("sim"), 4).as("sim"))
  }

  /** The distinct (qid, vec_id) candidate pairs the LSH probe generates —
    * exactly what [[lshTopK]] scores; exposed so tests and capacity
    * planning can measure selectivity (candidates / corpus). */
  def lshCandidates(emb: DataFrame, queryIds: Seq[Long],
                    tables: Int = 4, bits: Int = 6): DataFrame =
    lshCandidateRows(emb, queryIds, tables, bits).select(col("qid"), col("vec_id"))

  /** Same-bucket (query, vector) pairs with both embeddings attached, one
    * row per distinct pair. A pair can collide in several tables — dedup
    * is ONE grouped first() over the already-joined rows (they carry both
    * embeddings) instead of a distinct + two joins back to the corpus. */
  private def lshCandidateRows(emb: DataFrame, queryIds: Seq[Long],
                               tables: Int, bits: Int): DataFrame = {
    def buckets(df: DataFrame): DataFrame = df.select(
      col("vec_id"), col("embedding"),
      posexplode(LshSignature.lsh_buckets(col("embedding"), tables, bits))
        .as(Seq("t", "bucket")))
    val qb = broadcast(
      buckets(emb.filter(col("vec_id").isin(queryIds: _*)))
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("t"), col("bucket")))
    buckets(emb).join(qb, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(first(col("q_emb")).as("q_emb"), first(col("embedding")).as("embedding"))
  }

  /** Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine ≥ τ),
    * blocked by the trained IVF bucket: only same-bucket pairs are
    * compared (candidates outside a bucket are assumed dissimilar; recall
    * measured in tests). Bucket count ⌈√N⌉ grows with the data, and
    * `maxBucket` drops degenerate clusters, so the Σ m² same-bucket work
    * stays ~N^1.5 with bounded skew — never the full O(N²) cross join. */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
                        maxBucket: Int = 1000): DataFrame =
    embeddingNearDups(emb, threshold, maxBucket, trainedIvf(emb))

  /** [[embeddingNearDups]] over a shared trained model (same model the
    * ANN search probes — one training pass serves both operators). */
  def embeddingNearDups(emb: DataFrame, threshold: Double, maxBucket: Int,
                        model: (DataFrame, DataFrame)): DataFrame = {
    val (_, assigned) = model
    val keptBuckets = assigned.groupBy(col("bucket"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m").between(2, maxBucket))
      .select(col("bucket"))
    val inCapped = assigned.join(broadcast(keptBuckets), Seq("bucket"), "left_semi")
      .withColumn("n", norm(col("embedding")))
    inCapped.alias("a").join(inCapped.alias("b"), "bucket")
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosinePre(col("a.embedding"), col("b.embedding"), col("a.n"), col("b.n")).as("sim"))
      .filter(round(col("sim"), 6) >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }
}
