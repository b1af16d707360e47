package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("paretoFrontier keeps exactly the non-dominated rows") {
    // (id, price, size); minimize both
    val df = Seq(
      (1L, 1.0, 5), // frontier (cheapest)
      (2L, 2.0, 3), // frontier (cheaper than 3, smaller than 1)
      (3L, 2.0, 4), // dominated by 2 (same price, bigger)
      (4L, 3.0, 3), // dominated by 2 (more expensive, same size)
      (5L, 3.0, 1), // frontier
      (6L, 4.0, 1), // dominated by 5
      (7L, 0.5, 9)  // frontier (new cheapest)
    ).toDF("id", "price", "size")
    val out = Skyline.paretoFrontier(df, col("price"), col("size"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 5L, 7L))
  }

  test("duplicate frontier points all survive; brute force agrees") {
    val rows = (1 to 60).map { i =>
      (i.toLong, (i * 37 % 11).toDouble, i * 53 % 13)
    }
    val df = rows.toDF("id", "price", "size")
    val expected = rows.filter { case (_, p, s) =>
      !rows.exists { case (_, qp, qs) =>
        qp <= p && qs <= s && (qp < p || qs < s)
      }
    }.map(_._1).toSet
    val out = Skyline.paretoFrontier(df, col("price"), col("size"))
      .select("id").as[Long].collect().toSet
    assert(out == expected)
  }

  test("weightedPriority favors heavy weights and is deterministic") {
    val df = (1 to 2000).map(i => (i.toLong, if (i <= 100) 100.0 else 1.0))
      .toDF("k", "w")
      .withColumn("score", Sampling.weightedPriority(col("k"), col("w")))
    val top = df.orderBy("score").limit(50).select("k").as[Long].collect()
    // the 100 heavy keys carry ~84% of total weight; over half of the
    // top-50 picks must come from them under any reasonable draw
    assert(top.count(_ <= 100L) > 25)
    val again = df.orderBy("score").limit(50).select("k").as[Long].collect()
    assert(top.sameElements(again))
  }

  test("weightedPriority surfaces non-positive weights as null") {
    val df = Seq((1L, 2.0), (2L, 0.0), (3L, -5.0))
      .toDF("k", "w")
      .withColumn("score", Sampling.weightedPriority(col("k"), col("w")))
    val byKey = df.collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(!byKey(1L))             // valid weight scores
    assert(byKey(2L) && byKey(3L)) // zero/negative surface as null
  }
}
