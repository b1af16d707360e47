package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Join semantics (reference `tests/test_orders_etl.py:107-145`) and the
  * end-to-end golden run over the reference's real sample CSVs — the test
  * the reference itself lacks. Goldens were computed by executing the
  * reference pipeline on the same inputs.
  */
class PipelineSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("left join keeps unmatched orders with null product attributes") {
    val orders = Seq(
      (34556L, 111L, "Paid"), (59690L, 222234L, "Waiting"),
      (33454L, 49586L, "Paid"), (45567L, 456542L, "Paid")
    ).toDF("product_id", "order_source_id", "status")
    val products = Seq(
      (34556L, 45.0, "Творчість та канцтовари", "BIC"),
      (59690L, 56.55, "Творчість та канцтовари", "BIC"),
      (33454L, 10.0, "Ігрові фігурки", "Bingo"),
      (56332L, 13.5, "Іграшки для розвитку", "Hama")
    ).toDF("product_id", "price", "goods_group", "manufacturer")

    val out = Pipeline.joinFrames(orders, products)
    assert(out.columns.toSeq ==
      Seq("product_id", "order_source_id", "status", "price", "goods_group", "manufacturer"))
    assert(out.count() == 4)
    val unmatched = out.filter($"product_id" === 45567L).collect()(0)
    assert(unmatched.isNullAt(3) && unmatched.isNullAt(4) && unmatched.isNullAt(5))
    val matched = out.filter($"product_id" === 59690L).collect()(0)
    assert(matched.getDouble(3) == 56.55 && matched.getString(5) == "BIC")
  }

  private val ordersCsv = "/root/reference/input_data/orders_s.csv"
  private val productsCsv = "/root/reference/input_data/products_s.csv"
  private def fixturesPresent: Boolean =
    Files.exists(Paths.get(ordersCsv)) && Files.exists(Paths.get(productsCsv))

  test("end-to-end golden run on the reference sample CSVs") {
    assume(fixturesPresent, "reference sample CSVs not available")
    // File-order keep-first requires a single input partition for the CSV
    // (matches pandas' sequential read).
    val orders = Pipeline.processedOrders(spark, ordersCsv).cache()
    val products = Pipeline.processedProducts(spark, productsCsv)
    val out = Pipeline.joinFrames(orders, products).cache()

    // Goldens from executing the reference pipeline on these CSVs:
    assert(orders.count() == 1499)          // 2,502 → 1,499 after dedup
    assert(products.count() == 3765)        // no product dupes
    assert(out.count() == 1499)
    assert(out.columns.length == 13)
    assert(out.filter($"price".isNull).count() == 0)   // every product matches
    // blanked name-field counts after cleaning
    assert(orders.filter($"name" === "").count() == 8)
    assert(orders.filter($"surname" === "").count() == 26)
    assert(orders.filter($"patronymic" === "").count() == 80)
    // numeric normalization aggregate (comma-decimal repairs included)
    val total = out.agg(bround(sum($"sum"), 2)).as[Double].collect()(0)
    assert(total == 1369538.22)
    // spot row (first by order key)
    val r = out.orderBy("order_source_id", "product_id").limit(1)
      .select("order_source_id", "name", "surname", "patronymic", "product_id",
        "price", "manufacturer")
      .collect()(0)
    assert(r.getLong(0) == 339132L)
    assert(r.getString(1) == "татьяна" && r.getString(2) == "кушнир"
      && r.getString(3) == "николаевна")
    assert(r.getLong(4) == 517010L && r.getDouble(5) == 778.0
      && r.getString(6) == "Dickie Toys")
    orders.unpersist(); out.unpersist()
  }
}
