package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The person-name cleaning pipeline (reference `etl/orders_etl.py:173-192`),
  * re-expressed as pure built-in column expressions (codegen'd, no UDF).
  *
  * Reference semantics, in order:
  *   1. HTML-entity unescape (`html.unescape` per value, `:187`),
  *   2. Unicode lowercase (`:188`),
  *   3. delete every digit (`:189`),
  *   4. one `re.sub` pass of the mega-pattern
  *      `\d|\s|^(-)$|(^\w{1}$)|(^[VOWELS]{0,}$)|(^[^VOWELS]{0,}$)` (`:185,190`).
  *
  * Step 4 is a *single left-to-right scan*, which matters:
  *   - the anchored branches can only fire at position 0 spanning the whole
  *     string, so a value is blanked iff the entire (digit-stripped, still
  *     space-bearing) value is all-vowels or all-non-vowels;
  *   - the `^(-)$` and `^\w{1}$` branches are subsumed: every 1-char string
  *     is entirely-vowels or entirely-non-vowels;
  *   - BUT if the value *starts* with whitespace, the `\s` branch wins at
  *     position 0 first, after which `^` can never match again — so a
  *     leading-whitespace value is never blanked, only space-stripped;
  *   - values that survive blanking get their whitespace deleted.
  *
  * The vowel set mixes Latin + Ukrainian/Russian Cyrillic exactly as declared
  * (`ю ё э ы` deliberately absent — they count as "consonants").
  */
object CleanNames {

  val Vowels = "aoueiyаяєоуиіїе"

  /** Whole-string blanking test: entirely vowels or entirely non-vowels
    * (each class includes the empty string, so `""` and `"-"` both blank).
    */
  private val blankPattern = s"^([$Vowels]*|[^$Vowels]*)$$"

  /** Regexp-chain HTML-entity unescape covering the apostrophe family plus
    * the five XML named entities — the oracle-parity subset (DuckDB can
    * mirror it; it covers everything in the reference data, which only
    * carries `&#039;`).
    */
  def htmlUnescape(c: Column): Column = {
    // Decimal numeric entities for the apostrophe family seen in the wild.
    val e1 = regexp_replace(c, "&#0*39;", "'")
    val e2 = regexp_replace(e1, "&#x0*27;", "'")
    val e3 = regexp_replace(e2, "&quot;", "\"")
    val e4 = regexp_replace(e3, "&lt;", "<")
    val e5 = regexp_replace(e4, "&gt;", ">")
    val e6 = regexp_replace(e5, "&apos;", "'")
    regexp_replace(e6, "&amp;", "&")
  }

  /** Full pipeline over one column. Null in → null out (pandas would throw
    * on NaN; our data has none, and null-passthrough is the safer engine
    * default).
    *
    * Entity decoding composes the regexp chain (`&apos;` + the apostrophe
    * numerics, which commons-text's HTML4 table lacks) with the native
    * [[graft.functions.HtmlUnescape]] expression (full named/numeric
    * coverage ≈ Python `html.unescape` — without it, an undecoded numeric
    * entity like `&#8217;` would have its digits destroyed by the
    * digit-strip step). Regexes carry `(?U)` so `\d`/`\s` are
    * Unicode-aware like Python's, not ASCII-only like Java's default.
    */
  def clean(c: Column): Column = {
    val unescaped = graft.functions.StringExpressions.htmlUnescape(htmlUnescape(c))
    val lowered   = lower(unescaped)
    val noDigits  = regexp_replace(lowered, "(?U)\\d", "")
    when(
      noDigits.rlike("(?U)^\\s"), regexp_replace(noDigits, "(?U)\\s", "")
    ).when(
      noDigits.rlike(blankPattern), lit("")
    ).otherwise(
      regexp_replace(noDigits, "(?U)\\s", "")
    )
  }
}
