package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("salted join returns exactly the plain join result") {
    // one hot key (1) with many fact rows, plus unmatched key 99
    val fact = (Seq.tabulate(500)(i => (1L, i.toLong)) ++
      Seq((2L, 1000L), (99L, 2000L))).toDF("k", "seq")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unused")).toDF("k", "label")

    val salted = SkewJoin.saltedLeftJoin(fact, dim, "k",
      hash(col("seq")), saltBuckets = 8)
    val plain = fact.join(dim, Seq("k"), "left")

    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == 502)
    assert(salted.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
    // unmatched key survives with null label
    assert(salted.filter($"k" === 99L && $"label".isNull).count() == 1)
  }

  test("salt actually spreads a hot key across buckets") {
    val fact = Seq.tabulate(100)(i => (1L, i.toLong)).toDF("k", "seq")
    val buckets = fact
      .withColumn("_salt", pmod(hash(col("seq")), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets >= 6)  // 100 draws over 8 buckets: all-but-certain spread
  }
}
