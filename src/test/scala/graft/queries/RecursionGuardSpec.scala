package graft.queries

import graft.TestSpark
import org.scalatest.concurrent.TimeLimits.failAfter
import org.scalatest.concurrent.Signaler
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Minutes, Span}

/** Guards the foot-gun the `recursive_tree_depth` scaladoc warns about:
  * UNION ALL recursion over CYCLIC data (the trade graph, a ring, any
  * edge set with a loop) never terminates logically — the engine must
  * fail loudly at its recursion level limit (default 100), not hang or
  * OOM. If a Spark upgrade ever changed this to silent truncation, a
  * cyclic input would return a WRONG answer instead of an error, so the
  * spec pins the error class, not just "some exception".
  */
class RecursionGuardSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("cyclic recursion fails loudly at the recursion level limit") {
    // failAfter pins BOTH halves of the contract: if a Spark upgrade
    // regressed the limit to silent looping, collect() would never
    // return and an unbounded intercept would wedge the suite instead
    // of reporting the regression
    implicit val signaler: Signaler =
      (t: Thread) => t.interrupt()
    spark.range(3).selectExpr("id", "(id + 1) % 3 AS nxt")
      .createOrReplaceTempView("ring_guard")
    failAfter(Span(2, Minutes)) {
      val e = intercept[Exception] {
        spark.sql(
          """WITH RECURSIVE walk AS (
            |  SELECT id, nxt FROM ring_guard WHERE id = 0
            |  UNION ALL
            |  SELECT r.id, r.nxt FROM ring_guard r JOIN walk w ON r.id = w.nxt)
            |SELECT count(*) AS n FROM walk""".stripMargin).collect()
      }
      assert(e.getMessage.contains("RECURSION_LEVEL_LIMIT_EXCEEDED"),
        s"expected the recursion limit error, got: ${e.getMessage.take(200)}")
    }
  }

  test("the certified tree walk sits far below the default limit") {
    // log2(custkey-space) levels: 11 at sf0.01 — a 100-level budget
    // covers key spaces up to ~2^99; the certified key never rides the
    // limit, which is what makes the guard above a pure error-path pin
    val rows = graft.SparkEntry.queries("recursive_tree_depth")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length < 100 && rows.nonEmpty)
  }
}
