package graft.ops

import graft.TestSpark
import graft.etl.Readers
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Catalyst's runtime bloom-filter injection (InjectRuntimeFilter) on
  * the join shape this engine cares about at 100 TB: a big fact table
  * joined to a selectively-filtered dimension. The optimizer builds a
  * bloom filter from the filtered dim keys and applies `might_contain` to
  * the fact side BEFORE its shuffle — most fact rows die at the scan
  * stage instead of crossing the wire. Locally the size thresholds are
  * far above the testdata, so the spec lowers the application-side
  * threshold to force the decision and asserts (a) the filter really is
  * in the optimized plan and (b) the answer is unchanged by it.
  */
class BloomRuntimeFilterSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def answer(): Seq[org.apache.spark.sql.Row] = {
    val orders = Readers.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    Readers.table(spark, sfDir, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
      .collect().toSeq
  }

  test("selective dim join gets a bloom filter on the fact side") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      val baseline = answer() // before forcing anything: the true numbers
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local parquet is KBs; drop the 10GB application-side floor so the
      // rule makes the same decision it would on a 100 TB fact scan
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // broadcast would bypass the runtime filter (and be the right plan
      // locally); disable to reproduce the at-scale SMJ/SHJ shape
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Readers.table(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = Readers.table(spark, sfDir, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
      val optimized = joined.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("might_contain") ||
        optimized.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter in:\n$optimized")
      assert(joined.collect().toSeq == baseline)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
