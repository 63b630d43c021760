package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Tokenizer
import graft.codec.VarintExpressions._

/** BM25 parameters fixed by the project contract (BASELINE.md):
  * k1=0.9, b=0.4, idf = ln((N−df+0.5)/(df+0.5)+1).
  *
  * `termIdSeed`: salt for the 64-bit term-id hash (see
  * [[Bm25Index.termId]]). 0 = unsalted. The build audits id injectivity
  * over the vocabulary and fails fast on a collision — rebuild with a
  * different seed (recorded in the stage manifest config).
  *
  * `termBuckets`: 0 (default) = flat blocks layout; > 0 = the blocks
  * stage is additionally hive-partitioned by `bucket =
  * pmod(term_id, termBuckets)`, so a query-time term probe prunes whole
  * DIRECTORIES before any parquet footer is read (see
  * [[graft.index.IndexBuilder]] and SCALE.md §layout). Opt-in because it
  * costs the build one extra exchange of the compressed blocks.
  */
case class Bm25Params(k1: Double = 0.9, b: Double = 0.4, blockSpan: Long = 8192,
                      termIdSeed: Int = 0, termBuckets: Int = 0)

/** Inverted-index build as composable DataFrame transforms.
  *
  * This is the lexical re-expression of the reference's index pipeline
  * (reference: colbert/indexing/collection_indexer.py:61-78 — encode →
  * compress → IVF build): tokenize → postings(tf) → corpus stats →
  * compressed posting blocks. Every transform is a declarative Catalyst
  * plan — partial aggregation, shuffle partitioning and parquet pushdown
  * come from the optimizer, replacing the reference's hand-rolled
  * multiprocess launcher (colbert/infra/launcher.py).
  *
  * Scale notes (100 TB / 10^12 docs):
  * - `postings` groups on (term, doc_id) — key space is per-document, so
  *   stopword skew does NOT concentrate on one reducer (unlike a naive
  *   groupBy(term)). Partial (map-side) aggregation collapses duplicates
  *   before the shuffle.
  * - `blocks` groups on (term, block_no) where block_no = doc_id/blockSpan:
  *   a docId-RANGE block. A stopword term with 10^11 postings becomes
  *   ~10^7 independent keys of ≤ blockSpan entries each — this is the
  *   explicit skew handling ("salting" by doc range) required by the north
  *   rule, with the bonus that the salt is semantically meaningful: blocks
  *   align with doc-partitioned query shards.
  * - Posting blocks keep the groupBy(term_id, block_no) hash layout (an
  *   extra range exchange would re-sample the aggregate — SURVEY §8.1)
  *   and are sortWithinPartitions(term_id, block_no), so parquet
  *   row-group min/max stats on term_id give query-time pruning (the
  *   IVF-probe analog); Bm25Params.termBuckets upgrades this to
  *   directory-level partition pruning.
  */
object Bm25Index {

  /** 64-bit term id = xxhash64(term) — the dictionary encoding of
    * SURVEY §2.11 (reference analog: compress_into_codes maps every
    * token to an int32 centroid code so nothing downstream touches
    * strings, colbert/indexing/codecs/residual.py:204-220). The posting
    * blocks, the build's one big shuffle, and every query-time join key
    * on this fixed-width long instead of the raw term string — at a
    * 10^8–10^9-term web vocabulary that shrinks shuffle rows and probe
    * keys several-fold. Injectivity over the vocabulary is audited at
    * build time (over the blocks table, which carries the term string);
    * on a collision the build fails fast and a salted seed re-keys the
    * index. */
  def termId(term: org.apache.spark.sql.Column, seed: Int = 0): org.apache.spark.sql.Column =
    if (seed == 0) xxhash64(term) else xxhash64(lit(seed), term)

  /** (doc_id, text, …) → (doc_id, term) — one row per token occurrence,
    * after lowercase/split/truncate-220 (SURVEY §2.3 T2). */
  def docTerms(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      explode(Tokenizer.tokenizeDoc(col("text"))).as("term"))

  /** (term, doc_id, tf) — SURVEY §2.5 A4/A7. */
  def postings(docs: DataFrame): DataFrame =
    docTerms(docs)
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("tf"))

  /** (term, doc_id, tf, dl) — postings carrying the doc length; NO global
    * aggregation. tf is counted inside each document by the term_counts
    * expression (map-phase, O(dl log dl) per row — see
    * [[graft.analysis.TermCountsExpr]]) and dl rides along for free, so
    * the whole transform is a narrow scan-speed projection; the ONLY
    * shuffle in the postings build is the layout repartition that follows.
    * At web scale this removes a 10^11-group hash aggregation AND the
    * doc-stats join from the hot path. */
  def postingsWithDl(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Tokenizer.tokenizeDoc(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(graft.analysis.TermCounts.term_counts(col("toks"))).as("e"))
      .select(col("e.term").as("term"), col("doc_id"), col("e.tf").as("tf"), col("dl"))

  /** (doc_id, dl) — doc length in tokens (reference doclens,
    * colbert/indexing/collection_indexer.py:355). */
  def docStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(Tokenizer.tokenizeDoc(col("text"))).as("dl"))

  /** One-row (n_docs, avgdl, sum_dl) — broadcast-sized corpus stats
    * (reference avg_doclen all_reduce, collection_indexer.py:133-183).
    * avgdl is derived as Σdl / n (dl sums are exact integers far below
    * 2^53, so this equals avg() bit-for-bit) and Σdl is kept on the row:
    * persisted per segment, it makes merged corpus stats ADDITIVE —
    * openMerged reconstructs exact (n, avgdl) from per-segment one-row
    * tables without rescanning 10^12 docs rows. */
  def corpusStats(docStats: DataFrame): DataFrame =
    docStats.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
      .select(
        col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"),
        col("sum_dl"))

  /** (term, term_id, df, idf) — document frequency + Robertson idf, plus
    * the dictionary id (the ONLY place strings map to ids: queries compile
    * through this table, so they never hash at query time). The df
    * histogram is the lexical analog of the reference's codes bincount
    * (collection_indexer.py:475). */
  def termStats(postings: DataFrame, corpusStats: DataFrame,
                termIdSeed: Int = 0): DataFrame =
    withIdf(
      postings
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .select(col("term"), termId(col("term"), termIdSeed).as("term_id"), col("df")),
      corpusStats)

  /** Append Robertson idf to a table carrying a `df` column (other columns
    * pass through). Shared by every stats producer (fresh aggregation,
    * blocks-derived, openMerged's incremental df merge) so all emit the
    * bit-identical closed form. */
  def withIdf(dfTable: DataFrame, corpusStats: DataFrame): DataFrame =
    dfTable
      .crossJoin(broadcast(corpusStats.select(col("n_docs"))))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .drop("n_docs")

  /** tf-saturation term of BM25 — exact per (tf, dl) once avgdl is known. */
  def tfNorm(tf: org.apache.spark.sql.Column, dl: org.apache.spark.sql.Column,
             avgdl: org.apache.spark.sql.Column, p: Bm25Params): org.apache.spark.sql.Column =
    tf.cast("double") * (p.k1 + 1.0) /
      (tf.cast("double") + lit(p.k1) * (lit(1.0 - p.b) + lit(p.b) * dl.cast("double") / avgdl))

  /** Compressed posting blocks:
    * (term_id, block_no, n, doc_ids_enc, tfs_enc, dls_enc, block_max_tfnorm).
    *
    * Keyed by the 64-bit [[termId]] — the term STRING never enters the
    * blocks shuffle or the stored table (dictionary decompilation goes
    * through termStats). docIds are delta+varint encoded (strictly
    * increasing within a block), tf and dl plain varint. block_max_tfnorm
    * is the block-max WAND bound (max over entries of the tf-saturation
    * term; upper bound of any in-block score contribution is
    * idf * block_max_tfnorm). Reference analog: residual-compressed
    * chunks + IVF over int32 codes
    * (colbert/indexing/codecs/residual.py:167-220, indexing/utils.py:8-64).
    */
  def blocks(postingsWithDl: DataFrame, corpusStats: DataFrame,
             p: Bm25Params): DataFrame =
    postingsWithDl
      .select(
        termId(col("term"), p.termIdSeed).as("term_id"),
        (col("doc_id") / p.blockSpan).cast("long").as("block_no"),
        col("term"), col("doc_id"), col("tf"), col("dl"))
      // `term` is part of the GROUP KEY, not a first() passenger: absent a
      // collision this is the identical grouping (term determines term_id),
      // the string still costs one copy per block group in the shuffle
      // (map-side partial agg collapses it; the sorted layout RLE/dict-
      // encodes it in parquet) and the termstats stage can be derived from
      // this table alone — without it, building the dictionary costs a
      // SECOND full scan + shuffle of the postings table, the build's
      // largest intermediate. On a term_id collision both strings survive
      // as separate rows, so the build-time injectivity audit over this
      // table sees EVERY collision (a first() would erase one string when
      // the colliding terms share all their blocks, letting a corrupt
      // merged index pass the audit).
      .groupBy(col("term_id"), col("block_no"), col("term"))
      .agg(collect_list(struct(col("doc_id"), col("tf"), col("dl"))).as("entries"))
      .crossJoin(broadcast(corpusStats.select(col("avgdl"))))
      // one fused pass: sort + delta+varint + block-max (BlockEncodeExpr)
      .select(
        col("term_id"),
        col("block_no"),
        col("term"),
        graft.codec.BlockEncode.block_encode(col("entries"), col("avgdl"), p.k1, p.b).as("be"))
      .select(
        col("term_id"),
        col("block_no"),
        col("term"),
        col("be.n").as("n"),
        col("be.doc_ids_enc").as("doc_ids_enc"),
        col("be.tfs_enc").as("tfs_enc"),
        col("be.dls_enc").as("dls_enc"),
        col("be.block_max_tfnorm").as("block_max_tfnorm"))

  /** [[blocks]] with the aggregation and the encode fused into ONE
    * Catalyst aggregate (`BlockEncodeAggExpr`): postings accumulate into
    * primitive arrays instead of collect_list's per-row objects and cross
    * the shuffle as varint bytes — the blocks stage is ~90% of build
    * time, and its limit at high core counts is memory traffic, not CPU.
    * Needs avgdl as a DRIVER value (the persisted build reads it from
    * the committed one-row corpusstats stage); row-identical to [[blocks]]
    * (property-tested in CodecSpec + the build identity suites). */
  def blocksAgg(postingsWithDl: DataFrame, avgdl: Double, p: Bm25Params): DataFrame =
    postingsWithDl
      .select(
        termId(col("term"), p.termIdSeed).as("term_id"),
        (col("doc_id") / p.blockSpan).cast("long").as("block_no"),
        col("term"), col("doc_id"), col("tf"), col("dl"))
      .groupBy(col("term_id"), col("block_no"), col("term"))
      .agg(graft.codec.BlockEncode.block_encode_agg(
        col("doc_id"), col("tf"), col("dl"), avgdl, p.k1, p.b).as("be"))
      .select(
        col("term_id"),
        col("block_no"),
        col("term"),
        col("be.n").as("n"),
        col("be.doc_ids_enc").as("doc_ids_enc"),
        col("be.tfs_enc").as("tfs_enc"),
        col("be.dls_enc").as("dls_enc"),
        col("be.block_max_tfnorm").as("block_max_tfnorm"))

  /** (term, term_id, df, idf, max_tfnorm) derived from the BLOCKS table —
    * df = Σ block n (postings are unique per (term, doc)), dictionary
    * string and block-max carried on the block rows. Replaces a second
    * full postings scan + groupBy(term) shuffle with an aggregation over
    * the already-compressed blocks (orders of magnitude fewer rows).
    *
    * `audit`: optional injectivity audit of the term→term_id hash, folded
    * into the same aggregation as an observed metric — `collisions` =
    * number of term_ids carrying two distinct term strings (min ≠ max;
    * cheap simple aggregates, no distinct-aggregate Expand). The
    * dictionary string is min(term): deterministic, and identical to any
    * other choice whenever the audit passes. */
  def termStatsFromBlocks(blocks: DataFrame, corpusStats: DataFrame,
                          audit: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val agg = blocks
      .groupBy(col("term_id"))
      .agg(min(col("term")).as("term"),
        max(col("term")).as("__term_hi"),
        sum(col("n")).as("df"),
        max(col("block_max_tfnorm")).as("max_tfnorm"))
    val audited = audit match {
      case Some(obs) => agg.observe(obs,
        sum(when(col("term") =!= col("__term_hi"), 1L).otherwise(0L)).as("collisions"))
      case None => agg
    }
    withIdf(audited.drop("__term_hi"), corpusStats)
      .select(col("term"), col("term_id"), col("df"), col("idf"), col("max_tfnorm"))
  }

  /** Inverse of [[blocks]]: explode back to (term_id, doc_id, tf, dl).
    * Used by the scorer; proves the codec round-trips inside one Catalyst
    * plan. */
  def decodeBlocks(blocks: DataFrame): DataFrame =
    blocks
      .select(
        col("term_id"),
        explode(arrays_zip(
          delta_varint_decode(col("doc_ids_enc")).as("doc_id"),
          varint_decode(col("tfs_enc")).as("tf"),
          varint_decode(col("dls_enc")).as("dl"))).as("e"))
      .select(
        col("term_id"),
        col("e.doc_id").as("doc_id"),
        col("e.tf").as("tf"),
        col("e.dl").as("dl"))
}
