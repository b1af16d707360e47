package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The warehouse sink: truncate-and-load semantics
  * (`if_exists="replace"`, reference `etl/run.py:11`) and the
  * `dataset.tablename` naming contract (reference `etl/bq_client.py:24`).
  */
class SinkSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("overwrite replaces prior contents (truncate-and-load)") {
    val root = Files.createTempDirectory("graft-sink").toString
    Sink.overwriteTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      root, "orders.denormalized")
    val first = spark.read.parquet(s"$root/orders/denormalized")
    assert(first.count() == 2)

    Sink.overwriteTable(Seq((9L, "z")).toDF("id", "v"),
      root, "orders.denormalized")
    val second = spark.read.parquet(s"$root/orders/denormalized")
    assert(second.as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("rejects table names outside the dataset.tablename contract") {
    val df = Seq((1L, "a")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Sink.overwriteTable(df, "/tmp/x", "no_dataset_part")
    }
    intercept[IllegalArgumentException] {
      Sink.overwriteTable(df, "/tmp/x", "a.b.c")
    }
  }
}
