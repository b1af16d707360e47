package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver may smoke-check `SparkEntry.entry` from a session it builds
  * itself, without graft's extensions installed — every public entry point
  * must work there (the declarative dedup falls back to the direct window
  * form).
  */
class NoExtensionsEntrySpec extends AnyFunSuite {

  test("entry works in a session without GraftExtensions") {
    // run AFTER the shared TestSpark session exists; newSession() shares
    // the SparkContext but NOT the extensions-injected session state
    val base = TestSpark.spark
    val plain = base.newSession()
    plain.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(plain.conf.getOption("spark.sql.extensions").isEmpty
      || !plain.sessionState.analyzer.toString.contains("graft"))
    val df = SparkEntry.entry(plain)
    assert(df.count() > 0)
  }
}
