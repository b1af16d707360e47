package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the bracket-and-refine exact quantile against Spark's
  * built-in exact `percentile` aggregate — the contract Quantiles.exact
  * advertises. Cases target the refine machinery's edges: heavy ties at
  * the bracket bounds (tie mass must resolve arithmetically, not enter the
  * sort), n far below the sketch guarantee (coverage flags must relax the
  * bracket), integral vs fractional interpolation positions, and grouped
  * inputs with wildly different group sizes.
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builtin(df: DataFrame, qs: Seq[Double]): Seq[Double] = {
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      expr(s"percentile(v, ${q}d)").as(s"q$i")
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    qs.indices.map(r.getDouble)
  }

  private def refined(df: DataFrame, qs: Seq[Double], acc: Int): Seq[Double] = {
    val specs = qs.zipWithIndex.map { case (q, i) =>
      Quantiles.Q(s"q$i", col("v"), q)
    }
    val r = Quantiles.exact(df, specs, accuracy = acc).collect()(0)
    qs.indices.map(r.getDouble)
  }

  private val Qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  test("bit-parity with built-in percentile: continuous values") {
    // deterministic pseudo-random doubles; accuracy 200 → ε·n ≈ 7, so the
    // bracket path (not the small-n relaxation) is what's exercised
    val vs = (1 to 1499).map(i => (i * 2654435761L % 1000003).toDouble / 7.0)
    val df = vs.toDF("v")
    assert(refined(df, Qs, 200) == builtin(df, Qs))
  }

  test("bit-parity under heavy ties (tie mass outside the sort)") {
    // 60% of mass is the single value 5.0 — the median bracket collapses
    // onto a tie; boundary-count arithmetic must produce it
    val vs = Seq.fill(1800)(5.0) ++ (1 to 600).map(_.toDouble / 3.0) ++
      (1 to 600).map(i => 100.0 + i / 7.0)
    val df = vs.toDF("v")
    assert(refined(df, Qs, 200) == builtin(df, Qs))
  }

  test("bit-parity at small n (coverage flags relax the bracket)") {
    for (n <- Seq(1, 2, 3, 10, 97)) {
      val df = (1 to n).map(i => (i * 37 % 19).toDouble).toDF("v")
      assert(refined(df, Qs, 10000) == builtin(df, Qs), s"n=$n")
    }
  }

  test("bit-parity with nulls ignored like the built-in") {
    val df = ((1 to 999).map(i => Some(i.toDouble)) ++
      Seq.fill(500)(Option.empty[Double])).toDF("v")
    assert(refined(df, Qs, 300) == builtin(df, Qs))
  }

  test("grouped: per-group parity with mixed group sizes") {
    val rows = (1 to 1200).map(i => ("big", (i * 48271 % 9973).toDouble)) ++
      (1 to 7).map(i => ("tiny", i * 10.0)) ++
      Seq.fill(900)(("tied", 42.0))
    val df = rows.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.9)
    val exp = df.groupBy("g").agg(
      expr("percentile(v, 0.25d)").as("q0"),
      expr("percentile(v, 0.5d)").as("q1"),
      expr("percentile(v, 0.9d)").as("q2"))
    val got = Quantiles.exact(df,
      qs.zipWithIndex.map { case (q, i) => Quantiles.Q(s"q$i", col("v"), q) },
      groupCols = Seq("g"), accuracy = 300)
    val e = exp.orderBy("g").collect().map(_.toSeq).toSeq
    val g = got.orderBy("g").collect().map(_.toSeq).toSeq
    assert(g == e)
  }

  test("plan has no whole-column percentile buffer and stays lazy") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Quantiles.exact(df, Seq(Quantiles.Q("m", col("v"), 0.5)))
    val plan = out.queryExecution.executedPlan.toString
    // the built-in exact aggregate would show up as Percentile; the op
    // must only carry the bounded-state sketch
    assert(!plan.replace("percentile_approx", "PA").contains("percentile("),
      "exact Percentile leaked into plan")
    assert(plan.contains("percentile_approx"),
      "expected the GK sketch bracket in the plan")
  }
}
