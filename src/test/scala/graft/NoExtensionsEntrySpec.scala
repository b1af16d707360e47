package graft

import graft.etl.Dedup
import org.apache.spark.sql.GraftColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** Driver-parity checks for sessions graft did not build itself.
  *
  * Note a true extensions-less session is unreachable in-JVM: Spark's
  * session constructors re-apply `spark.sql.extensions` from the shared
  * SparkConf (verified — a bare `new SparkSession(sc)` still lowers the
  * custom node). The no-rule branch of `keepFirstDeclarative` is therefore
  * a two-line fallback guarded by a plan inspection, exercised only in
  * truly foreign SparkContexts; what IS testable is that the operator
  * behaves correctly in any session over this context, whichever branch.
  */
class NoExtensionsEntrySpec extends AnyFunSuite {

  test("keepFirstDeclarative is correct in an independently-built session") {
    val bare = GraftColumnBridge.bareSession(TestSpark.spark)
    import bare.implicits._
    val df = Seq(
      (1L, "a", 10L, "first"), (1L, "a", 20L, "late"), (2L, "b", 5L, "only")
    ).toDF("k1", "k2", "seq", "tag")
    val out = Dedup.keepFirstDeclarative(df, Seq("k1", "k2"), Seq("seq"))
      .select("tag").as[String].collect().toSet
    assert(out == Set("first", "only"))
  }

  test("entry works in a bare session (driver smoke parity)") {
    val bare = GraftColumnBridge.bareSession(TestSpark.spark)
    bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(SparkEntry.entry(bare).count() > 0)
  }
}
