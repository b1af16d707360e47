package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ReadersSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("fanOut repartitions a narrow source to full parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val narrow = (1 to 100).toDF("v").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    assert(Readers.fanOut(narrow).rdd.getNumPartitions == p)
  }

  test("fanOut is a NO-OP when the source already has enough splits") {
    val p = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("v").repartition(math.max(2, p))
    val out = Readers.fanOut(wide)
    // same DataFrame back — no extra exchange inserted
    assert(out eq wide)
  }

  test("events reader converts nano longs to microsecond timestamps") {
    val sf = "/root/testdata/sf0.001"
    val df = Readers.events(spark, sf)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.limit(1).count() == 1)
  }
}
