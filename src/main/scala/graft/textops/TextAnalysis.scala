package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. All are pure `org.apache.spark.sql.functions` column
  * expressions — whole-stage-codegen'd, no UDFs, no shuffles; they scale
  * as embarrassingly parallel scans at any data size.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).as("ws_tokens")

  /** BPE pre-tokenizer count, GPT-2-regex style: English contraction
    * suffixes, space-prefixed letter runs, digit runs, and symbol runs
    * (whitespace between tokens is skipped, not counted). The pattern
    * deliberately avoids lookaround so it means the same thing under
    * Java regex (Spark, backtracking leftmost-first) and RE2 (DuckDB
    * oracle, leftmost-first in default mode) — cross-engine exact.
    */
  val bpePretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+"

  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(bpePretokenPattern))

  /** Simpler, oracle-checkable token count: alphanumeric runs. */
  def alnumTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+"))

  /** Quality-score feature columns: length, punctuation ratio, stopword
    * ratio, mean word length, uppercase ratio. A downstream filter keeps
    * documents inside healthy ranges (C4/Gopher-rule style).
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val nTokens = size(split(trim(text), "\\s+"))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "punct_ratio" ->
        (regexp_count(text, lit("[\\.,;:!\\?]")).cast("double") /
          greatest(nChars.cast("double"), lit(1.0))),
      "stopword_ratio" ->
        (regexp_count(lower(text),
          lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b")).cast("double") /
          greatest(nTokens.cast("double"), lit(1.0))),
      "mean_word_len" ->
        ((nChars - (nTokens - lit(1))).cast("double") /
          greatest(nTokens.cast("double"), lit(1.0))),
      "upper_ratio" ->
        (regexp_count(text, lit("[A-Z]")).cast("double") /
          greatest(nChars.cast("double"), lit(1.0))))
  }

  /** Composite quality score in [0,1]: 1 − mean distance from healthy
    * ranges. Deterministic, expression-only.
    */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val punctOk = when(f("punct_ratio") <= 0.1, 1.0).otherwise(0.0)
    val stopOk = when(f("stopword_ratio") >= 0.05 && f("stopword_ratio") <= 0.6, 1.0).otherwise(0.0)
    val lenOk = when(f("n_tokens") >= 5 && f("n_tokens") <= 100000, 1.0).otherwise(0.0)
    val wordOk = when(f("mean_word_len") >= 2.0 && f("mean_word_len") <= 12.0, 1.0).otherwise(0.0)
    ((punctOk + stopOk + lenOk + wordOk) / 4.0).as("quality")
  }

  /** Language-ID by stopword/marker-ngram voting — the classic cheap
    * heuristic (per-language marker lexicons; argmax of hit counts).
    * Expression-only: one `regexp_count` per language, a `greatest`
    * argmax, no shuffle.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|that|for|with|this|have)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|eine|mit|für)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|pour|dans|que|avec)\\b",
    "es" -> "\\b(el|los|las|es|una|para|que|con|por|del)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, re) =>
      (lang, regexp_count(lower(text), lit(re))) }
    val best = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc) }
    pick.as("lang_id")
  }

  /** Document fingerprint: polynomial rolling hash over the code points
    * (base 31, mod 1e9+7 — small enough that acc*31+c never overflows
    * i64), order-sensitive (a true rolling hash, not a bag hash).
    * Runs as the custom codegen'd [[graft.functions.RollingHash]]
    * expression — the equivalent `aggregate(transform(split(…)))` fold is
    * interpreted per character (ArrayAggregate has no codegen) and
    * allocates a per-char array; see [[rollingFingerprintHof]].
    */
  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash.rollingHash(text).as("fingerprint")

  /** The expression-only HOF formulation, kept as the reference
    * implementation the custom expression is equivalence-tested against.
    */
  def rollingFingerprintHof(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, p)).as("fingerprint")
  }

  /** Within-document repetition features (Gopher/Dolma-style repetition
    * filter): the fraction of a doc's word-3-gram SLOTS not covered by
    * distinct 3-grams, as an exact integer permille — high values mean
    * the doc repeats itself (boilerplate, generation loops). Pure
    * codegen'd scan via the [[graft.functions.WordShingles]] kernel;
    * `(doc_id, n_gram_slots, n_gram_distinct, dup_permille)`.
    */
  def repetitionFeatures(text: Column): Seq[(String, Column)] = {
    val toks = size(filter(split(lower(text), "\\W+"), t => t =!= ""))
    val slots = greatest(toks - 2, lit(1))
    val distinctGrams = size(Dedup.wordShingles(text, 3))
    Seq(
      "n_gram_slots" -> slots.cast("bigint"),
      "n_gram_distinct" -> distinctGrams.cast("bigint"),
      // floor of the exact quotient ≡ integer division: Column./ is
      // double division in Spark, so floor() is what matches SQL `//`
      // (numerator ≤ ~2e6 keeps the double exact enough that floor can
      // never straddle an integer: a non-exact quotient is ≥ 1/slots
      // away from one, ≫ double rounding error)
      "dup_permille" ->
        (lit(1000) - floor(distinctGrams * 1000 / slots)).cast("bigint"))
  }

  /** Attach the full analysis column set to a documents DataFrame. */
  /** Dedup-robust text normalization (the CCNet/RefinedWeb-style
    * preprocessing step in front of exact AND near dedup): lowercase,
    * fold every digit run to `0`, collapse whitespace runs to one space,
    * trim. Two documents differing only in numbers, casing, or layout
    * normalize to the same string, so hashing the normalized form
    * catches template/boilerplate duplicates raw sha misses. Pure
    * codegen'd expressions — a map over the scan, no shuffle.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[0-9]+", "0"), "\\s+", " "))

  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    qualityFeatures(t).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_id", langId(t))
      .withColumn("fingerprint", rollingFingerprint(t))
  }
}
