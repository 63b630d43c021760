package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling + dataset mixing — the training-data mixture
  * step of an LLM pipeline (each source up/down-sampled to its target
  * share of the corpus).
  *
  * Every keep-decision is a pure function of (seed, row key): re-running
  * the pipeline, resuming it, or running it at different parallelism
  * selects EXACTLY the same rows (rand()-based sampling is
  * non-deterministic under retries and repartitioning). The hash is
  * md5-based like the dedup family, so the DuckDB oracles reproduce it
  * bit-for-bit; thresholds stay in HEX-STRING space (lexicographic order
  * on lowercase hex == numeric order) to avoid any engine-specific
  * hex→integer conversion.
  *
  * Scale shape: a stateless per-row filter — no shuffle, no driver data,
  * pushes through column pruning like any scan predicate.
  */
object Sampling {

  /** 8-hex-char deterministic key in [0, 2^32), uniform for distinct
    * inputs, as a lowercase hex STRING (portable ordering). */
  def hashKey(key: Column, seed: String): Column =
    substring(md5(concat_ws("|", lit(seed), key.cast("string"))), 1, 8)

  /** rate → lexicographic threshold over [[hashKey]] values: floor(rate ·
    * 2^32) as 8-char hex; rate ≥ 1 returns "g" (> every hex digit ⇒ keep
    * all — a clamped "ffffffff" would drop the 2^-32 tail). */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else if (rate <= 0.0) "00000000"
    else f"${(rate * 4294967296.0).toLong}%08x"

  /** Deterministic uniform sample: keep iff hash(seed, key) < rate·2^32. */
  def sampleByHash(df: DataFrame, key: Column, rate: Double, seed: String): DataFrame =
    df.filter(hashKey(key, seed) < lit(hexThreshold(rate)))

  /** Weighted source mixing: keep each row of source s with rate
    * rates(s); rows of unconfigured sources are DROPPED (a mixture
    * definition is a whitelist). Rates ≥ 1 keep the whole source — hash
    * sampling cannot duplicate rows, so true oversampling (rate 2.0) is
    * a union-of-epochs concern upstream, not a filter's. The per-source
    * threshold is resolved driver-side into a literal CASE chain: the
    * row-side work stays one md5 + one string compare. */
  def mixBySource(df: DataFrame, source: Column, key: Column,
                  rates: Map[String, Double], seed: String): DataFrame = {
    val thr = rates.foldLeft(lit(null).cast("string")) { case (acc, (s, r)) =>
      when(source === lit(s), lit(hexThreshold(r))).otherwise(acc)
    }
    df.filter(thr.isNotNull && hashKey(key, seed) < thr)
  }
}
