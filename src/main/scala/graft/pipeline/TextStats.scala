package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.{TermCounts, Tokenizer}

/** Text-quality analysis for training-data curation: token counting,
  * quality scoring, language ID, content fingerprinting. Everything is a
  * narrow projection over the text column — embarrassingly parallel, no
  * shuffle, whole-stage-codegen friendly; at 100 TB these run at scan
  * speed and exist to FILTER (the cheap pre-pass before dedup/indexing).
  */
object TextStats {

  /** Stopword profiles for the n-gram-free language-ID heuristic. Fixed
    * tiny sets (they are the spec, mirrored in the oracle SQL). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una"))

  /** Token counts three ways: whitespace split, lexical tokens, and a
    * BPE-ish regex segmentation (letter runs | single digits | single
    * symbols) — the usual proxy for LLM token budgets. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(Tokenizer.tokenizeDoc(col("text"))).as("word_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0))).as("bpe_ish_tokens"))

  /** Quality features + a deterministic composite score in [0, 1]:
    * penalize punctuation-heavy, stopword-anomalous, and very-short docs.
    * The exact formula is the spec (oracle mirrors it):
    * q = max(0, 1 − 2·punct_ratio − |stop_ratio − 0.35| − short_penalty),
    * short_penalty = max(0, (50 − n_tokens)/50). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = Tokenizer.tokenizeDoc(col("text"))
    val enStops = LangProfiles.head._2
    val nTok = size(toks).cast("double")
    val punct = length(regexp_replace(lower(col("text")), "[a-z0-9 ]", "")).cast("double") /
      greatest(length(col("text")).cast("double"), lit(1.0))
    val stopRatio = size(filter(toks, t => t.isin(enStops: _*))).cast("double") /
      greatest(nTok, lit(1.0))
    val shortPen = greatest(lit(0.0), (lit(50.0) - nTok) / lit(50.0))
    docs.select(
      col("doc_id"),
      nTok.cast("int").as("n_tokens"),
      round(punct, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stop_ratio"),
      round(greatest(lit(0.0),
        lit(1.0) - lit(2.0) * punct - abs(stopRatio - lit(0.35)) - shortPen), 6).as("quality"))
  }

  /** Language ID: argmax over profiles of the per-language stopword hit
    * COUNT (token multiplicity counts), ties broken by profile order
    * (en > de > fr > es), zero hits → "und" (undetermined). */
  def langId(docs: DataFrame): DataFrame = {
    val toks = Tokenizer.tokenizeDoc(col("text"))
    val scored = LangProfiles.map { case (lang, stops) =>
      struct(size(filter(toks, t => t.isin(stops: _*))).as("hits"), lit(lang).as("lang"))
    }
    // array_max on struct(hits, lang) would pick ties by LARGEST lang
    // string; enforce profile-order tiebreak via priority field instead.
    val prioritized = LangProfiles.zipWithIndex.map { case ((lang, stops), i) =>
      struct(
        size(filter(toks, t => t.isin(stops: _*))).as("hits"),
        lit(LangProfiles.size - i).as("prio"),
        lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      when(greatest(scored.map(_.getField("hits")): _*) === 0, "und")
        .otherwise(array_max(array(prioritized: _*)).getField("lang")).as("pred_lang"))
  }

  /** Repetition signals for quality filtering — the Gopher repetition
    * rules (Rae et al. 2021, "Scaling Language Models: Methods, Analysis
    * & Insights from Training Gopher", table A1) made deterministic:
    * boilerplate and spam pages repeat; these three ratios are what the
    * published filters threshold on.
    *
    *   distinct_ratio   = |distinct tokens| / n   (low ⇒ repetitive)
    *   top_token_frac   = max token multiplicity / n
    *   dup_bigram_frac  = 1 − |distinct bigrams| / (n−1)   (null if n<2)
    *
    * Whitespace tokens (the same split as `ws_tokens` above). Per-row
    * projection like the rest of this file — no shuffle, runs at scan
    * speed; counts come from the fused [[TermCounts.term_counts]] pass
    * (O(n) map lookups) instead of an O(V·n) filter-per-distinct-token
    * HOF. */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val counts = TermCounts.term_counts(toks)
    val n = size(toks).cast("double")
    val bigrams = transform(sequence(lit(1), size(toks) - 1),
      i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      round(size(counts).cast("double") / greatest(n, lit(1.0)), 6)
        .as("distinct_ratio"),
      round(array_max(transform(counts, c => c.getField("tf"))).cast("double") /
        greatest(n, lit(1.0)), 6).as("top_token_frac"),
      // the branch guards the sequence(): n = 1 would make it descend
      when(size(toks) >= 2,
        round(lit(1.0) -
          size(array_distinct(bigrams)).cast("double") / (n - lit(1.0)), 6))
        .as("dup_bigram_frac"))
  }

  /** PII patterns (shared with the oracle SQL verbatim — RE2/Java common
    * subset: no lookaround, no backreferences). The hyphen in the phone
    * class is last, so it is literal in both dialects. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "[+(]?[0-9][0-9() -]{6,}[0-9]"

  /** PII scrub — the redaction pass every published LLM-corpus pipeline
    * runs before training (emails / IPv4 / phone-shaped digit runs, the
    * three pattern families the BigScience ROOTS and FineWeb pipelines
    * target). Emits per-doc match counts (from the ORIGINAL text) plus
    * the redacted text. Replacement order matters and is part of the
    * spec: emails first (their digits would otherwise feed the phone
    * pattern), then IPv4 (dots exclude them from the phone class), then
    * phones over what remains. Pure regexp projection — no shuffle,
    * scan-speed at 100 TB like the rest of this file. */
  def piiScrub(docs: DataFrame, text: Column): DataFrame = {
    def n(re: String) = size(regexp_extract_all(text, lit(re), lit(0)))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    docs.select(
      col("doc_id"),
      n(EmailRe).as("n_emails"),
      n(Ipv4Re).as("n_ips"),
      n(PhoneRe).as("n_phones"),
      redacted.as("redacted"))
  }

  /** Content fingerprint: md5 over canonical tokens (full 128-bit hex) +
    * a 16-bucket shard id from its first hex digit — the partition key a
    * fingerprint store would shard on. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val fp = md5(Dedup.canonicalText(col("text")))
    docs.select(
      col("doc_id"),
      fp.as("fingerprint"),
      conv(substring(fp, 1, 1), 16, 10).cast("int").as("shard"))
  }
}
