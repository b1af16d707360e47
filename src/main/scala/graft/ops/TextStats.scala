package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-document text analysis for corpus curation: token counting, quality
  * scoring, language-ID heuristics, content fingerprinting. All row-local
  * column expressions — map-only at any scale, fused into one codegen stage
  * with whatever scan feeds them.
  */
object TextStats {

  /** English stopword core used by the ratio heuristic. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count estimate: ~4 chars per token, ceil division in
    * integer arithmetic (identical across engines).
    */
  def bpeTokenEstimate(text: Column): Column =
    floor((length(text) + lit(3)) / lit(4)).cast("long")

  /** Fraction of tokens that are core stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = split(text, " ")
    val stops = filter(w, x => x.isin(Stopwords: _*))
    size(stops).cast("double") / size(w)
  }

  /** Fraction of characters that are not alphanumeric/space; null for the
    * empty string (ANSI division by zero would otherwise abort the scan,
    * and DuckDB's NaN would disagree).
    */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", "")))
        .cast("double") / length(text))

  /** Mean token length in characters. */
  def avgTokenLength(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: stopword presence (fluency proxy),
    * length saturation, punctuation cleanliness.
    */
  def qualityScore(text: Column): Column =
    round(
      lit(0.4) * least(stopwordRatio(text) * 10.0, lit(1.0))
        + lit(0.3) * least(tokenCount(text).cast("double") / 100.0, lit(1.0))
        + lit(0.3) * (lit(1.0) - punctRatio(text)),
      6)

  /** Stopword-based language-ID heuristic: flags text as English when core
    * English stopwords exceed 2% of tokens. (A production n-gram profile
    * model slots in behind the same column contract.)
    */
  def langPredict(text: Column): Column =
    when(stopwordRatio(text) >= 0.02, lit("en")).otherwise(lit("other"))

  /** Content fingerprint: md5 of the case-folded, whitespace-collapsed
    * text. Identical fingerprints ⇒ exact duplicates post-normalization.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))
}
