package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("hashSample: deterministic, key-stable, near the nominal rate") {
    val df = (1L to 5000L).toDF("id")
    val s1 = Sampling.hashSample(df, col("id"), 1, 10).as[Long].collect().toSet
    val s2 = Sampling.hashSample(df.repartition(7), col("id"), 1, 10)
      .as[Long].collect().toSet
    assert(s1 == s2)                       // partitioning-independent
    assert(math.abs(s1.size - 500) < 100)  // ~10%
    // keep buckets nest: a 20% sample contains the 10% sample
    val s20 = Sampling.hashSample(df, col("id"), 2, 10).as[Long].collect().toSet
    assert(s1.subsetOf(s20))
  }

  test("hashBucket covers [0, outOf) roughly uniformly") {
    val counts = (1L to 2000L).toDF("id")
      .select(Sampling.hashBucket(col("id"), 4).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == Set(0L, 1L, 2L, 3L))
    counts.values.foreach(c => assert(math.abs(c - 500) < 120))
  }
}
