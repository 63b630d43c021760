package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Tokenizer

/** Large-scale corpus deduplication operators — the training-data-pipeline
  * side of the engine (exact, MinHash+LSH, SimHash, n-gram Jaccard). All
  * pure DataFrame/Catalyst plans; every hash is md5-based so the semantics
  * are engine-portable (the DuckDB oracles in SparkEntry reproduce them
  * exactly).
  *
  * Scale design (10^12 docs):
  * - exact: one shuffle on a 128-bit content hash; partial agg collapses
  *   per-partition duplicates before the shuffle.
  * - MinHash/LSH: per-doc signature work is embarrassingly parallel
  *   (array HOFs, no shuffle); candidate generation shuffles on band keys
  *   — bounded fanout (BANDS keys/doc); a band bucket of size m yields
  *   m² pairs, so bucket skew is the hazard: pathological buckets
  *   (boilerplate pages) are dropped via `maxBucket`, the rest split by
  *   AQE skew handling.
  * - n-gram Jaccard: candidate pairs from a shared-shingle equi-join
  *   (shuffle on shingle hash), then exact |A∩B|/|A∪B| from
  *   distinct-shingle counts — no cross join anywhere.
  * - SimHash: signature is a per-doc aggregation; near-dup candidates via
  *   the pigeonhole chunk join (4 chunks of 4 bits: hamming ≤ 3 ⇒ ≥1
  *   chunk identical), then exact hamming verify.
  */
object Dedup {

  val MinhashFns = 16
  val Bands = 4 // 4 bands × 4 rows

  /** Canonical text: tokens re-joined with single spaces — whitespace/
    * punctuation-insensitive identity. */
  def canonicalText(text: Column): Column =
    concat_ws(" ", Tokenizer.tokenizeDoc(text))

  /** Exact-dedup canonical assignment: every doc mapped to the group
    * survivor (canon_id = min doc_id sharing its canonical text) with the
    * group size. `canon_id != doc_id` marks the rows a dedup pass drops. */
  def canonicalMap(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), md5(canonicalText(col("text"))).as("h"))
    val groups = keyed.groupBy(col("h"))
      .agg(min(col("doc_id")).as("canon_id"), count(lit(1)).as("group_size"))
    keyed.join(groups, "h")
      .select(col("doc_id"), col("canon_id"), col("group_size"))
  }

  /** Exact dedup: only docs in groups of ≥2 (the actual duplicates). */
  def exactDups(docs: DataFrame): DataFrame =
    canonicalMap(docs).filter(col("group_size") >= 2)

  /** Token n-gram shingles as strings ("w1 w2 w3"). Empty when the doc has
    * fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Per-doc MinHash signature as ONE fused scalar pass (no explode, no
    * shuffle, no intermediate arrays): see [[MinhashSignatureExpr]]. The
    * previous relational formulation exploded |shingles|×16 rows through
    * a (doc_id, i) shuffle for the same result.
    * Docs with < n tokens (no shingles) are dropped (null signature). */
  def minhashSignatures(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = Tokenizer.tokenizeDoc(col("text"))
    docs
      .select(col("doc_id"),
        MinhashSignature.minhash_signature(shingles(toks, n)).as("mins"))
      .filter(col("mins").isNotNull)
  }

  /** Row view of [[minhashSignatures]]: (doc_id, i, h) — kept for tests
    * and oracle shape; the 16-row fanout happens AFTER the per-doc min. */
  def minhashMins(docs: DataFrame, n: Int = 3): DataFrame =
    minhashSignatures(docs, n)
      .select(col("doc_id"), posexplode(col("mins")).as(Seq("i", "h")))

  /** (doc_id, band, key): LSH band keys, 4 bands of 4 signature rows;
    * band key = md5(band || '|' || concat of its 4 mins in i-order).
    * Fully fused into [[MinhashSignature.minhash_band_keys]] (a SINGLE
    * plan reference — re-slicing an exposed signature column 16× would
    * let CollapseProject recompute the signature per reference). The
    * first shuffle of the whole MinHash pipeline is the bucket grouping
    * in [[minhashPairs]]; explode of the null (shingle-less) signature
    * emits no rows, preserving the docs-with-<n-tokens contract. */
  def minhashBands(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"),
        explode(MinhashSignature.minhash_band_keys(
          shingles(Tokenizer.tokenizeDoc(col("text")), n))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Candidate near-dup pairs (doc_a < doc_b) sharing ≥1 LSH band.
    * Pairs are generated from ONE grouped pass per bucket (no self-join
    * re-evaluating the signature pipeline). `maxBucket` drops pathological
    * boilerplate buckets (a bucket of size m emits m(m−1)/2 pairs —
    * unbounded skew without the cap); the collect itself is buffer-capped
    * at maxBucket+1 ([[BoundedCollect]]) so an over-cap bucket never
    * materializes beyond the cap in ANY buffer, map-side or reduce-side. */
  def minhashPairs(docs: DataFrame, n: Int = 3, maxBucket: Int = 1000): DataFrame =
    minhashBands(docs, n)
      .groupBy(col("band"), col("key"))
      .agg(BoundedCollect.longs(maxBucket)(col("doc_id")).as("raw"))
      .filter(size(col("raw")).between(2, maxBucket))
      .select(sort_array(col("raw")).as("ids"))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  a -> transform(slice(ids, a + 1, size(ids) - a),
          |    b -> struct(ids[a - 1] AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()

  /** SimHash-64 signature over md5 hex digits: bit j (1..64) = 1 iff
    * Σ_terms tf·(hexdigit_j(md5(term)||md5('s|'||term)) − 7.5) > 0,
    * rendered as a 64-char '0'/'1' string (engine-portable: the DuckDB
    * oracle reproduces the hexdigit construction exactly). Relational
    * formulation: (doc, term, tf) × positions, weighted sum per
    * (doc, position). */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        SimhashSignature.simhash_bits(Tokenizer.tokenizeDoc(col("text"))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash near-dup pairs with hamming distance ≤ maxDist (default 3):
    * candidates share ≥1 of 4 16-bit chunks (pigeonhole-complete for
    * maxDist ≤ 3), verified by exact hamming on the packed signature.
    *
    * Scale: the candidate key space is 4×2^16 ≈ 262k buckets and grows
    * with signature width, and `maxBucket` drops pathological buckets
    * (boilerplate-heavy corpora collapse onto few signatures — a bucket
    * of size m emits m²/2 pairs). Pairs are generated by ONE grouped
    * pass per bucket, not a self-join, so the signature pipeline runs
    * once and bucket fan-out is bounded by maxBucket². */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(maxDist <= 3, "chunk join is only pigeonhole-complete for maxDist <= 3")
    // packed halves: hamming = popcount(xor(hi)) + popcount(xor(lo)) — two
    // instructions per candidate pair instead of 64 substring compares
    // (a single 64-bit conv would overflow signed long for high bit 1)
    val sigs = simhashSignatures(docs)
      .withColumn("hi", conv(col("simhash").substr(1, 32), 2, 10).cast("long"))
      .withColumn("lo", conv(col("simhash").substr(33, 32), 2, 10).cast("long"))
    val chunked = sigs.select(col("doc_id"), col("hi"), col("lo"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("cpos"),
          col("simhash").substr(c * 16 + 1, lit(16)).as("cval")))).as("ch"))
      .select(col("doc_id"), col("hi"), col("lo"),
        col("ch.cpos").as("cpos"), col("ch.cval").as("cval"))
    chunked
      .groupBy(col("cpos"), col("cval"))
      // buffer-capped collect (see minhashPairs): the struct fields come
      // back as _1/_2/_3, renamed by the transform below
      .agg(BoundedCollect.longs3(maxBucket)(col("doc_id"), col("hi"), col("lo")).as("raw"))
      .filter(size(col("raw")).between(2, maxBucket))
      .select(expr(
        """transform(sort_array(raw),
          |  x -> struct(x._1 AS doc_id, x._2 AS hi, x._3 AS lo))""".stripMargin).as("ids"))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  a -> transform(slice(ids, a + 1, size(ids) - a),
          |    b -> struct(ids[a - 1] AS pa, b AS pb))))""".stripMargin)).as("p"))
      .select(col("p.pa.doc_id").as("doc_a"), col("p.pb.doc_id").as("doc_b"),
        (bit_count(col("p.pa.hi").bitwiseXOR(col("p.pb.hi"))) +
         bit_count(col("p.pa.lo").bitwiseXOR(col("p.pb.lo")))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Exact n-gram Jaccard near-dups over DISCRIMINATIVE shingles: pairs
    * (doc_a < doc_b) with |A∩B|/|A∪B| ≥ threshold, where A/B are each
    * doc's distinct shingles with document frequency ≤ `maxShingleDf`.
    *
    * The df cap is the scale guard: without it, one boilerplate trigram
    * ("terms of service …") appearing in 10^8 docs makes the shared-
    * shingle join emit 10^16 pairs. High-df shingles carry no similarity
    * signal (they are common to everything), so they are dropped from the
    * shingle universe — candidate generation AND the intersection/union
    * counts — keeping the operator's output a true Jaccard over the
    * capped universe. A shingle kept by the cap fans out ≤ cap²/2 pairs.
    *
    * Plan shape: ONE groupBy(shingle) feeds both the per-doc sizes and
    * the pair counts (no self-join re-evaluating the shingle pipeline). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                        maxShingleDf: Int = 1000): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        explode(array_distinct(shingles(Tokenizer.tokenizeDoc(col("text")), n))).as("s"))
    val grouped = sh
      .groupBy(col("s"))
      // buffer-capped collect (see minhashPairs): a boilerplate shingle
      // with df 10^8 costs maxShingleDf+1 buffer entries, not 10^8
      .agg(BoundedCollect.longs(maxShingleDf)(col("doc_id")).as("raw"))
      .filter(size(col("raw")) <= maxShingleDf)
      // both consumers (sizes + pair counts) branch off the same
      // groupBy(s) exchange — Spark reuses the shuffle (ReusedExchange)
      .select(sort_array(col("raw")).as("ids"))
    val sizes = grouped
      .select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = grouped
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  a -> transform(slice(ids, a + 1, size(ids) - a),
          |    b -> struct(ids[a - 1] AS doc_a, b AS doc_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Connected components over a near-dup pair table — the cluster-
    * resolution step every real dedup pipeline needs AFTER pair
    * generation: near-duplication is transitive in practice (A≈B, B≈C ⇒
    * keep one of {A,B,C}), so pairs must be resolved into components
    * before a keeper can be chosen.
    *
    * Input: (doc_a, doc_b) pairs. Output: (id, cluster_id) — every doc
    * appearing in ≥1 pair labeled with its component's MINIMUM doc id
    * (deterministic at any parallelism; singletons never enter the pair
    * table and need no label).
    *
    * Algorithm: min-label propagation with pointer jumping (label(x) ←
    * label(label(x)) each round) — the doubling step makes convergence
    * O(log diameter) rounds, each round two hash joins + one bounded
    * driver count for the fixpoint test. Per-round checkpointing
    * truncates the iterative plan's lineage (without it the plan tree
    * doubles per round and Catalyst analysis goes quadratic). Scale: the
    * labels table is |V(pairs)| rows — near-dup pairs are O(corpus) by
    * construction (bucketed + capped upstream), and each round's joins
    * shuffle only (id, lbl) longs.
    *
    * `reliableCheckpoint = false` (default) uses `localCheckpoint` —
    * executor-local blocks, no extra I/O, right for interactive and
    * bounded jobs. `true` uses reliable `checkpoint` against the
    * session's `sparkContext.setCheckpointDir` (required, enforced
    * here): on a multi-hour cluster run an executor loss cannot then
    * force a from-scratch recompute of every prior round. Same plan,
    * same results either way. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
                          reliableCheckpoint: Boolean = false): DataFrame = {
    if (reliableCheckpoint)
      require(pairs.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint=true needs sparkContext.setCheckpointDir (an " +
          "HDFS/object-store path on a real cluster)")
    def checkpointed(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    val edges = checkpointed(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v"))))
    var labels = checkpointed(
      edges.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")))
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = edges.join(labels, edges("v") === labels("id"))
        .groupBy(col("u")).agg(min(col("lbl")).as("nm"))
      val prop = labels.join(nbrMin, labels("id") === nbrMin("u"), "left")
        .select(labels("id").as("id"),
          least(col("lbl"), coalesce(col("nm"), col("lbl"))).as("lbl"))
      // pointer jump: adopt the label OF the label (labels only ever
      // decrease, so the parent's label is ≤ ours and in-component)
      val parents = prop.select(col("id").as("pid"), col("lbl").as("plbl"))
      val next = checkpointed(
        prop.join(parents, prop("lbl") === parents("pid"))
          .select(prop("id").as("id"), col("plbl").as("lbl")))
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") =!= col("old")).count()
      converged = changed == 0
      labels = next
      it += 1
    }
    labels
  }

  /** End-to-end near-dup cluster resolution: verified Jaccard pairs →
    * connected components → one KEEPER per cluster (the longest doc by
    * token count, smallest doc_id on ties — the usual "keep the most
    * complete copy" policy). Output per clustered doc: (doc_id,
    * cluster_id, cluster_size, keeper_id); rows with doc_id != keeper_id
    * are what the dedup pass drops. Docs in no pair are untouched by
    * dedup and emit no row. */
  def neardupClusters(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
                      maxShingleDf: Int = 1000): DataFrame =
    neardupClustersFromPairs(ngramJaccardPairs(docs, n, threshold, maxShingleDf), docs)

  /** [[neardupClusters]] over an ALREADY-COMPUTED verified pair table —
    * a real dedup pipeline generates pairs once and feeds the same table
    * to the pair report and the cluster resolution. */
  def neardupClustersFromPairs(pairs0: DataFrame, docs: DataFrame): DataFrame = {
    val pairs = pairs0.select(col("doc_a"), col("doc_b"))
    val comp = connectedComponents(pairs)
    // tokenize ABOVE the membership join — only cluster MEMBERS pay the
    // token count (the previous shape put the tokenize in the join's
    // corpus-side projection, a full-corpus tokenize; Catalyst never
    // defers a projection past a join) — and ONE window pass over lbl
    // replaces the groupBy + rejoin that referenced (and re-executed)
    // the membership join twice. Clusters are bounded row groups, so the
    // window partition is skew-safe.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lbl"))
    comp
      .join(docs.select(col("doc_id").as("id"), col("text")), "id")
      .withColumn("n_tokens", size(Tokenizer.tokenizeDoc(col("text"))))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("best",
        min(struct((-col("n_tokens")).as("neg_len"), col("id").as("kid"))).over(w))
      .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_size"), col("best.kid").as("keeper_id"))
  }

  /** Benchmark decontamination — the standard LLM training-data hygiene
    * step (drop training docs that leak evaluation content): every corpus
    * doc sharing ≥ `minOverlap` DISTINCT n-gram shingles with ANY
    * benchmark doc is flagged with its overlap count. Tokenization and
    * shingling are the same machinery as [[ngramJaccardPairs]], so a
    * match means the same thing in both operators.
    *
    * Scale shape: the benchmark side is an EVAL SET — thousands of docs,
    * ~10^5–10^6 distinct shingles — so its shingle universe is
    * broadcast; the 10^12-doc corpus side is a map-side explode +
    * broadcast-hash probe with NO shuffle of corpus shingles (only the
    * surviving matches aggregate, and those are bounded by
    * |benchmark shingles| × df). Callers with a benchmark too large to
    * broadcast should pre-prune it (a benchmark that size is itself a
    * corpus, and jaccard/minhash dedup is the right tool instead). */
  def contaminated(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
                   minOverlap: Int = 1): DataFrame = {
    def sh(d: DataFrame) = d.select(col("doc_id"),
      explode(array_distinct(shingles(Tokenizer.tokenizeDoc(col("text")), n))).as("s"))
    val benchSh = broadcast(sh(benchmark).select(col("s")).distinct())
    sh(docs)
      .join(benchSh, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }
}
