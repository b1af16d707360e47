package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The OrdersEtl facade end-to-end: the exact call sequence of the
  * reference's `run.py` (process → write → find_similar_products with its
  * real target/candidates, reference `etl/run.py:3-16`).
  */
class OrdersEtlSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private val ordersCsv = "/root/reference/input_data/orders_s.csv"
  private val productsCsv = "/root/reference/input_data/products_s.csv"

  test("run.py call sequence: process, write, findSimilarProducts") {
    assume(Files.exists(Paths.get(ordersCsv)))
    val root = Files.createTempDirectory("graft-etl").toString
    val etl = new OrdersEtl(spark, ordersCsv, productsCsv,
      root, "orders.orders_denormalized")

    assert(etl.process().count() == 1499)

    etl.write()
    val written = spark.read.parquet(s"$root/orders/orders_denormalized")
    assert(written.count() == 1499 && written.columns.length == 13)

    // run.py's actual invocation: target 516423 with 8 candidates
    val scores = etl.findSimilarProducts(516423L,
      Seq(536469L, 296597L, 385613L, 516423L, 516425L, 427227L, 439541L, 528462L))
    assert(scores(516423L) == 1.0)
    assert(scores(536469L) == 0.08772)
    assert(scores.size == 8)

    intercept[IllegalArgumentException] {
      etl.findSimilarProducts(-1L, Seq(516423L))
    }
  }
}
