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

  /** Fraction of tokens that are core stopwords (native codegen
    * set-count — see [[graft.functions.TokenSetCount]]).
    */
  def stopwordRatio(text: Column): Column = {
    val w = split(text, " ")
    graft.functions.TokenSetCountFunctions.tokenSetCount(w, Stopwords)
      .cast("double") / size(w)
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

  /** Plain-JVM twin of [[fingerprint]] for typed streaming stages that
    * must run BEFORE the query's watermark definition (a typed
    * map loses the event-time tag, so composed streams compute all
    * object-side columns first and stay relational after) — same
    * normalize-then-lowercase-then-md5, byte-identical output
    * (CuratedNeardupQuotaSpec pins the parity).
    */
  def fingerprintJvm(text: String): String = {
    val normalized = text.replaceAll("\\s+", " ").toLowerCase
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(normalized.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Per-language function-word profiles for [[langIdStruct]], in
    * lexicographic language order (the order IS the deterministic
    * tie-break). Frequency-weighted token-set overlap against profiles
    * like these is the classic cheap language-ID heuristic (the stopword
    * layer of CLD/langid-style classifiers); a production model adds
    * character n-gram profiles behind the same column contract.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein",
      "eine", "zu", "den", "von", "mit", "auf", "für", "im"),
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it",
      "you", "that", "was", "for", "on", "are", "with"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "que", "en",
      "un", "una", "es", "no", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est",
      "pas", "que", "pour", "dans", "qui", "sur", "au"))

  /** Script gate: classify by script when that script's characters
    * exceed this fraction of non-whitespace characters — scripts
    * identify languages the function-word layer cannot see (unsegmented
    * or non-Latin: zh/ja/th have no spaces; ko/ar/hi tokens never hit a
    * Latin function-word profile). The ROUTING itself runs in exact
    * integer arithmetic inside the native profile expression
    * ([[graft.functions.CharProfileImpl.route]], `cnt*10 >= 3*nonspace`);
    * this double is the same constant for oracle-SQL rendering, where
    * double compare and exact rational compare provably agree for any
    * count below ~1e15 (the nearest representable double to 0.3 is
    * ~1e-17 away; adjacent count ratios differ by ≥ 1/(10·nonspace)).
    */
  val CjkMinFraction = 0.30

  /** Kana presence bar for the ja rule (kana/nonspace ≥ 1/20): real
    * Japanese often has a Han MAJORITY, but Chinese never contains
    * kana, so kana presence + a combined kana+han pass of the main bar
    * routes ja ahead of zh ([[graft.functions.CharProfileImpl]]).
    */
  val KanaMinFraction = 0.05

  /** Multi-language ID: `struct(lang_pred, score)` from a BOUND word
    * array (see [[graft.ops.Curation]] on why the split must be a
    * projected attribute). Two deterministic layers, both row-local and
    * oracle-expressible:
    *
    *   1. charset profile — script fraction of non-space characters
    *      ≥ [[CjkMinFraction]] routes the script's language (Han → zh,
    *      kana → ja with the [[KanaMinFraction]] presence rule, Hangul
    *      → ko, Arabic → ar, Devanagari → hi, Thai → th; score = the
    *      routed script's fraction);
    *   2. weighted token-set overlap — per language, the fraction of
    *      tokens that hit its [[LangProfiles]] function-word set (term
    *      frequency IS the weight); argmax wins, ties break in profile
    *      (lexicographic) order, an all-zero row is `und`.
    *
    * Null text → `und` with score 0 (the quality filter rejects it as
    * `empty` anyway). Map-only: fuses into the scan's codegen stage.
    */
  def langIdStruct(text: Column, words: Column): Column = {
    val n = size(words).cast("double")
    val scores = LangProfiles.map { case (l, ws) =>
      // native codegen set-count per profile — 4 profiles × every token
      // of every document is the scan's hot loop (see TokenSetCount)
      l -> graft.functions.TokenSetCountFunctions.tokenSetCount(words, ws)
        .cast("double") / n
    }
    val best = greatest(scores.map(_._2): _*)
    // one-pass native char profile + script route — the regexp_replace
    // spelling ran the regex engine (and built the replaced string) once
    // per script per CaseWhen branch below, ~65% of the lang_id key at
    // TWO counts; the route verdict (integer-exact) rides the packed
    // long, the score divides the packed numerator (see CharProfile)
    val prof = graft.functions.CharProfileFunctions.charProfile(text)
    val nonSpace = graft.functions.CharProfileFunctions.nonspaceOf(prof)
    val sid = graft.functions.CharProfileFunctions.scriptIdOf(prof)
    val num = graft.functions.CharProfileFunctions.scriptNumOf(prof)
    val scriptFrac = when(nonSpace > 0, num / nonSpace).otherwise(lit(0.0))
    val overlapPred = coalesce(scores.map { case (l, s) =>
      when(s === best, lit(l))
    }: _*)
    val pred = when(text.isNull, lit("und"))
      .when(sid > 0, graft.functions.CharProfileFunctions.scriptLangOf(prof))
      .when(best <= 0.0, lit("und"))
      .otherwise(overlapPred)
    val score = when(text.isNull, lit(0.0))
      .when(sid > 0, scriptFrac)
      .when(best <= 0.0, lit(0.0))
      .otherwise(best)
    struct(pred.as("lang_pred"), round(score, 6).as("score"))
  }
}
