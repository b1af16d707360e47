package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character profile + script route of a string, packed into
  * one long:
  *
  * {{{
  *   bits 63..60  script id (0 = no script route; see ScriptLangs)
  *   bits 59..32  the routed script's character count (the score
  *                numerator — kana+han for ja), saturating at 2^28-1
  *   bits 31..0   non-whitespace code point count, saturating at 2^32-1
  * }}}
  *
  * The walk counts code points in six script ranges — Han ideographs
  * [U+4E00, U+9FFF], kana (Hiragana+Katakana blocks [U+3040, U+30FF]),
  * Hangul syllables [U+AC00, U+D7AF], Arabic [U+0600, U+06FF],
  * Devanagari [U+0900, U+097F], Thai [U+0E00, U+0E7F] — and routes in
  * one place ([[CharProfileImpl.route]]) with EXACT integer arithmetic
  * (`count * 10 >= 3 * nonspace` for the 30% bar), so the DuckDB oracle
  * twin can reproduce the decision without floating-point edge risk.
  * Routing priority: ja fires BEFORE zh whenever kana has presence
  * (≥ 5% of non-space chars) and kana+han clears the main bar — real
  * Japanese mixes kana with Han and often has a Han MAJORITY, but
  * Chinese text never contains kana, so any kana presence identifies
  * ja. The remaining scripts are disjoint ranges and order cannot
  * matter; they are checked in a fixed order anyway for determinism.
  *
  * Scripts identify languages the function-word layer cannot see: ja,
  * th (and zh) are written WITHOUT spaces, and ko/ar/hi tokens never
  * hit a Latin function-word profile — before this layer they routed
  * `und` (or worse, through the word layer). A 100 TB crawl is full of
  * all six.
  *
  * Why a native expression: the regexp_replace spelling ran the regex
  * engine once per script per CaseWhen branch (Catalyst's subexpression
  * elimination skips conditional branches) and was measured at ~65% of
  * the whole `lang_id` key with just TWO counts (see git history of
  * this file); six scripts would make it strictly worse. This walks the
  * UTF8String's bytes once — no regex, no allocation on the hot path —
  * inside whole-stage codegen.
  *
  * Semantics notes: whitespace is Java regex `\s` = [ \t\n\x0B\f\r]
  * (ASCII-only, matching the replaced spelling); counts are in CODE
  * POINTS (Spark `length` counts UTF-8 sequence starts); Arabic is the
  * only 2-byte-UTF-8 range, the rest are 3-byte.
  */
case class CharProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_profile requires string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    CharProfileImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharProfileImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
  : CharProfile = copy(child = newChild)

  override def prettyName: String = "char_profile"
}

object CharProfileImpl {

  /** Script id → language code; index 0 is "no script route". The ORDER
    * is the routing priority (ja before zh — see class doc).
    */
  val ScriptLangs: Array[String] =
    Array("und", "ja", "zh", "ko", "ar", "hi", "th")

  /** The main script bar as an exact rational: route when
    * `count * RouteDen >= RouteNum * nonspace`, i.e. count/nonspace ≥
    * 3/10. [[graft.ops.TextStats.CjkMinFraction]] is the same constant
    * as a double for oracle-SQL rendering.
    */
  final val RouteNum = 3
  final val RouteDen = 10

  /** Kana presence bar for the ja rule: kana/nonspace ≥ 1/KanaDen. */
  final val KanaDen = 20

  /** Per-script code point counts:
    * [nonspace, han, kana, hangul, arabic, devanagari, thai].
    * Exposed for the property spec (each lane checked against the
    * regexp_replace spelling it replaces); [[compute]] fuses this walk
    * with [[route]] — the array never escapes a JIT-compiled caller.
    */
  def counts(s: UTF8String): Array[Long] = {
    val n = s.numBytes()
    var i = 0
    val c = new Array[Long](7)
    while (i < n) {
      val b = s.getByte(i)
      val len = UTF8String.numBytesForFirstByte(b)
      if (len == 1) {
        val ch = b & 0xff
        if (ch != 0x20 && (ch < 0x09 || ch > 0x0d)) c(0) += 1
      } else {
        c(0) += 1
        if (len == 2 && i + 1 < n) {
          val cp = ((b & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f)
          if (cp >= 0x0600 && cp <= 0x06ff) c(4) += 1
        } else if (len == 3 && i + 2 < n) {
          val cp = ((b & 0x0f) << 12) |
            ((s.getByte(i + 1) & 0x3f) << 6) | (s.getByte(i + 2) & 0x3f)
          if (cp >= 0x4e00 && cp <= 0x9fff) c(1) += 1
          else if (cp >= 0x3040 && cp <= 0x30ff) c(2) += 1
          else if (cp >= 0xac00 && cp <= 0xd7af) c(3) += 1
          else if (cp >= 0x0900 && cp <= 0x097f) c(5) += 1
          else if (cp >= 0x0e00 && cp <= 0x0e7f) c(6) += 1
        }
      }
      i += len
    }
    c
  }

  /** Pack the route verdict: (sid << 60) | (num << 32) | nonspace. */
  def route(c: Array[Long]): Long = {
    val nonspace = c(0)
    var sid = 0L
    var num = 0L
    if (nonspace > 0) {
      val han = c(1); val kana = c(2)
      if (kana * KanaDen >= nonspace &&
          (kana + han) * RouteDen >= RouteNum * nonspace) {
        sid = 1; num = kana + han
      } else if (han * RouteDen >= RouteNum * nonspace) {
        sid = 2; num = han
      } else if (c(3) * RouteDen >= RouteNum * nonspace) {
        sid = 3; num = c(3)
      } else if (c(4) * RouteDen >= RouteNum * nonspace) {
        sid = 4; num = c(4)
      } else if (c(5) * RouteDen >= RouteNum * nonspace) {
        sid = 5; num = c(5)
      } else if (c(6) * RouteDen >= RouteNum * nonspace) {
        sid = 6; num = c(6)
      }
    }
    (sid << 60) | (math.min(num, 0x0fffffffL) << 32) |
      math.min(nonspace, 0xffffffffL)
  }

  def compute(s: UTF8String): Long = route(counts(s))
}

object CharProfileFunctions {
  import org.apache.spark.sql.functions.{array, element_at, lit, shiftright}

  /** `char_profile(text)` as a Column (packed long). */
  def charProfile(text: Column): Column =
    GraftColumnBridge.column(
      CharProfile(GraftColumnBridge.expression(text)))

  /** The lanes, as Columns, from a (possibly shared) packed profile. */
  def nonspaceOf(profile: Column): Column =
    profile.bitwiseAND(lit(0xffffffffL)).cast("double")

  /** The routed script's character count (score numerator). */
  def scriptNumOf(profile: Column): Column =
    shiftright(profile, 32).bitwiseAND(lit(0x0fffffffL)).cast("double")

  /** Routed script id; 0 = no script identified. */
  def scriptIdOf(profile: Column): Column =
    shiftright(profile, 60).cast("int")

  /** Routed language code (`und` when no script route fired). */
  def scriptLangOf(profile: Column): Column =
    element_at(array(CharProfileImpl.ScriptLangs.toIndexedSeq.map(lit): _*),
      scriptIdOf(profile) + 1)
}
