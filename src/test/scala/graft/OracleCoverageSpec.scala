package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every `SparkEntry.queries` key must carry a DuckDB oracle: a key
  * registered in `queries` but missing from `oracleSql` silently degrades
  * to the driver's weaker rows-only check — `tools/selfcheck.py` never
  * compares it and still prints `failures: 0` (this nearly shipped with
  * `pretrain_pipeline` in r10: the funnel SQL had never executed). Keys
  * that are GENUINELY not SQL-expressible go in the explicit allowlist —
  * currently empty, and entries must stay oracle-free or leave it.
  */
class OracleCoverageSpec extends AnyFunSuite {

  private val rowsOnlyByDesign = Set.empty[String]

  test("every query key has an oracleSql entry or an explicit waiver") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val missing = q -- o -- rowsOnlyByDesign
    assert(missing.isEmpty,
      s"queries with neither an oracle nor a waiver: ${missing.toSeq.sorted}")
  }

  test("no stale oracle entries or waivers") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty,
      s"oracleSql entries without a query: ${(o -- q).toSeq.sorted}")
    assert((rowsOnlyByDesign -- q).isEmpty,
      "waivers for keys that no longer exist")
    assert((rowsOnlyByDesign & o).isEmpty,
      "waived keys that now HAVE an oracle - remove the waiver")
  }
}
