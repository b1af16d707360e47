package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden values pinned from the oracle engine's
  * `jaro_winkler_similarity` (probed directly; the implementation was
  * additionally fuzz-checked bit-exact over 20k random pairs before these
  * goldens were frozen). Exact double equality — the expression must
  * reproduce the reference arithmetic to the last ULP.
  */
class JaroWinklerSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val goldens = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("", "", 0.0),
    ("", "a", 0.0),
    ("a", "a", 1.0),
    ("abc", "", 0.0),
    ("ab", "ba", 0.0), // zero-width match window: no matches at all
    ("CRATE", "TRACE", 0.7333333333333334), // above threshold, no prefix
    ("crate", "CRATE", 0.0), // case-sensitive
    ("abcdef", "abzzzz", 0.5555555555555555), // below threshold: no boost
    ("prefixxyz", "prefiqqqq", 0.8222222222222222), // 4-char prefix cap
    ("aaaaaaaaaa", "aaaaaaaaab", 0.96),
    ("hello world", "hello wrold", 0.9818181818181818))

  test("jaro_winkler matches the oracle goldens exactly (codegen path)") {
    val out = goldens.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(JaroWinklerFunctions.jaroWinkler(col("a"), col("b")))
      .as[Double].collect()
    out.zip(goldens).foreach { case (got, (a, b, want)) =>
      assert(got == want, s"jaro_winkler($a, $b)")
    }
  }

  test("jaro_winkler interpreted eval agrees with codegen") {
    goldens.foreach { case (a, b, want) =>
      val got = JaroWinklerImpl.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
      assert(got == want, s"similarity($a, $b)")
    }
  }

  test("jaro_winkler is SQL-callable through the extension") {
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS s").as[Double].head()
    assert(r == 0.9611111111111111)
  }

  test("jaro_winkler null propagation") {
    val r = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(JaroWinklerFunctions.jaroWinkler(col("a"), col("b")))
      .collect()
    assert(r.head.isNullAt(0))
  }
}
