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

  /** MinHash signature: component i (0..15) = min over shingles of
    * md5(i || '|' || shingle) — a string-order min over a uniform hash is
    * a valid permutation min, and is reproducible in any engine with md5. */
  def minhashSignature(sh: Column): Column =
    transform(sequence(lit(0), lit(MinhashFns - 1)),
      i => array_min(transform(sh, s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** (doc_id, band, key): LSH band keys, 4 bands of 4 signature rows.
    * Docs with < n tokens (no shingles) are excluded — they cannot
    * meaningfully near-dup via shingling. */
  def minhashBands(docs: DataFrame, n: Int = 3): DataFrame = {
    val toks = Tokenizer.tokenizeDoc(col("text"))
    docs
      .select(col("doc_id"), shingles(toks, n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("sh")).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Bands - 1)),
          b => md5(concat(b.cast("string"), lit("|"),
            concat_ws("", slice(col("sig"), b * 4 + 1, lit(4))))))).as(Seq("band", "key")))
  }

  /** Candidate near-dup pairs (doc_a < doc_b) sharing ≥1 LSH band.
    * `maxBucket` drops pathological boilerplate buckets (a bucket of size m
    * emits m(m−1)/2 pairs — unbounded skew without the cap). */
  def minhashPairs(docs: DataFrame, n: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val bands = minhashBands(docs, n)
    val capped = bands.join(
      bands.groupBy(col("band"), col("key")).count()
        .filter(col("count") <= maxBucket)
        .select(col("band"), col("key")),
      Seq("band", "key"))
    capped.alias("a")
      .join(capped.alias("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash-16 signature over md5 hex digits: bit j (1..16) = 1 iff
    * Σ_terms tf·(hexdigit_j(md5(term)) − 7.5) > 0, rendered as a 16-char
    * '0'/'1' string (engine-portable; a production variant packs 64 bits —
    * identical plan shape). Relational formulation: (doc, term, tf) ×
    * positions, weighted sum per (doc, position). */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(Tokenizer.tokenizeDoc(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("h", md5(col("term")))
    tf
      .select(col("doc_id"), col("tf"), col("h"),
        explode(sequence(lit(1), lit(16))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      // hex digit value = instr('0123..f', ch) − 1; weight centers at 7.5
      .agg(sum(col("tf") *
        (expr("instr('0123456789abcdef', substring(h, j, 1))") - lit(8.5))).as("w"))
      .groupBy(col("doc_id"))
      .agg(concat_ws("",
        transform(
          array_sort(collect_list(struct(col("j"),
            when(col("w") > 0, "1").otherwise("0").as("bit")))),
          e => e.getField("bit"))).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist (default 3):
    * candidates share ≥1 of 4 4-bit chunks (pigeonhole-complete for
    * maxDist ≤ 3), verified by exact hamming. */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "chunk join is only pigeonhole-complete for maxDist <= 3")
    val sigs = simhashSignatures(docs)
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("cpos"),
          col("simhash").substr(c * 4 + 1, lit(4)).as("cval")))).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.cpos").as("cpos"), col("ch.cval").as("cval"))
    val hamming = expr(
      "aggregate(sequence(1, 16), 0, (acc, j) -> acc + IF(substring(a_sig, j, 1) = substring(b_sig, j, 1), 0, 1))")
    chunked.alias("a")
      .join(chunked.alias("b"), Seq("cpos", "cval"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("a_sig"), col("b.simhash").as("b_sig"))
      .distinct()
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
  }

  /** Exact n-gram Jaccard near-dups: pairs (doc_a < doc_b) with
    * |shingles_a ∩ shingles_b| / |shingles_a ∪ shingles_b| ≥ threshold.
    * Candidates come ONLY from the shared-shingle equi-join (a pair with
    * zero common shingles has similarity 0 and is never materialized). */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        explode(array_distinct(shingles(Tokenizer.tokenizeDoc(col("text")), n))).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.alias("a").join(sh.alias("b"), "s")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
