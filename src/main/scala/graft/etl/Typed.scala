package graft.etl

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` surface over the core tables — for callers who want
  * compile-time row types (the untyped DataFrame surface stays primary:
  * the reference is schema-first/column-oriented, and Column expressions
  * keep everything inside codegen; typed lambdas deserialize rows).
  *
  * The case classes mirror [[Schemas.orders]]/[[Schemas.products]] exactly,
  * so `df.as[T]` is a metadata-only cast — no extra pass over the data.
  */
object Typed {

  case class Order(order_source_id: Long,
                   order_created_datetime: java.sql.Timestamp,
                   customer_id: Long, status: String, sum: Double,
                   quantity: Long, name: String, surname: String,
                   patronymic: String, product_id: Long)

  case class Product(product_id: Long, price: Double, goods_group: String,
                     manufacturer: String)

  case class DenormalizedOrder(product_id: Long, order_source_id: Long,
                               order_created_datetime: java.sql.Timestamp,
                               customer_id: Long, status: String, sum: Double,
                               quantity: Long, name: String, surname: String,
                               patronymic: String, price: Option[Double],
                               goods_group: Option[String],
                               manufacturer: Option[String])

  def orders(spark: SparkSession, csvPath: String): Dataset[Order] = {
    import spark.implicits._
    Pipeline.processedOrders(spark, csvPath).as[Order]
  }

  def products(spark: SparkSession, csvPath: String): Dataset[Product] = {
    import spark.implicits._
    Pipeline.processedProducts(spark, csvPath).as[Product]
  }

  def denormalized(spark: SparkSession, ordersCsv: String,
                   productsCsv: String): Dataset[DenormalizedOrder] = {
    import spark.implicits._
    Pipeline.process(spark, ordersCsv, productsCsv).as[DenormalizedOrder]
  }
}
