package graft.functions

import graft.TestSpark
import graft.etl.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native tier must be bit-identical to the composed column-expression
  * tier (which the reference goldens already lock in).
  */
class SimilarityExpressionSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    // (price, group, mfr, t_price, t_group, t_mfr)
    (Some(10.0), Some("g"), Some("m"), Some(10.0), Some("g"), Some("m")),  // 1.0
    (Some(13.5), Some("g"), Some("x"), Some(10.0), Some("g"), Some("m")),
    (Some(200.0), Some("a"), Some("m"), Some(10.0), Some("g"), Some("m")),
    (Some(10.0), None, Some("m"), Some(10.0), Some("g"), Some("m")),       // null group
    (Some(10.0), Some("g"), Some("m"), Some(10.0), None, None),            // null target attrs
    (None, Some("g"), Some("m"), Some(10.0), Some("g"), Some("m")),        // null price → null
    (Some(10.0), Some("g"), Some("m"), None, Some("g"), Some("m")),        // null t_price → null
    (Some(0.123456), Some("g"), Some("m"), Some(0.654321), Some("g"), Some("m"))
  )

  test("native expression is bit-identical to the composed column tier") {
    val df = cases.toDF("price", "group", "mfr", "t_price", "t_group", "t_mfr")
      .select(
        Similarity.scoreExpr($"price", $"group", $"mfr",
          $"t_price", $"t_group", $"t_mfr").as("composed"),
        SimilarityFunctions.similarityScore($"price", $"group", $"mfr",
          $"t_price", $"t_group", $"t_mfr").as("native"))
    val rows = df.as[(Option[Double], Option[Double])].collect()
    rows.zip(cases).foreach { case ((c, n), in) =>
      assert(c.isDefined == n.isDefined, s"nullability diverged on $in")
      c.zip(n).foreach { case (cv, nv) =>
        assert(java.lang.Double.doubleToLongBits(cv) ==
          java.lang.Double.doubleToLongBits(nv), s"bits diverged on $in")
      }
    }
    // identical-product sanity: the reference golden is exactly 1.0
    assert(rows.head._2.contains(1.0))
  }

  test("registered in SQL as similarity_score_native") {
    cases.take(1).toDF("price", "group", "mfr", "t_price", "t_group", "t_mfr")
      .createOrReplaceTempView("sim_native_in")
    val out = spark.sql(
      """SELECT similarity_score_native(price, group, mfr,
        |                               t_price, t_group, t_mfr) AS s
        |FROM sim_native_in""".stripMargin).as[Double].collect()
    assert(out.toSeq == Seq(1.0))
  }

  test("wrong arity or types rejected at analysis") {
    Seq((1.0, 2.0)).toDF("a", "b").createOrReplaceTempView("sim_bad_in")
    val e = intercept[Exception] {
      spark.sql("SELECT similarity_score_native(a, b, a, b, a, b) FROM sim_bad_in")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("similarity_score"))
  }
}
