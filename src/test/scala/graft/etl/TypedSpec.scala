package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class TypedSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private val ordersCsv = "/root/reference/input_data/orders_s.csv"
  private val productsCsv = "/root/reference/input_data/products_s.csv"

  test("typed Dataset surface: as[T] is metadata-only and lambdas type-check") {
    assume(Files.exists(Paths.get(ordersCsv)))
    val ds = Typed.denormalized(spark, ordersCsv, productsCsv)
    // compile-time typed access end-to-end
    val bigOrders = ds.filter(o => o.quantity >= 10 && o.price.isDefined)
    assert(bigOrders.count() > 0)
    val first = ds.filter(_.order_source_id == 339132L).head()
    assert(first.name == "татьяна" && first.manufacturer.contains("Dickie Toys"))
  }
}
