package graft.etl

import org.apache.spark.sql.types._

/** Declared schemas for the reference's two CSV tables and the synthetic
  * testdata tables.
  *
  * The reference declares schema-on-read projection + post-scan coercion
  * (reference `etl/orders_etl.py:17-49`). We read CSVs all-string with an
  * explicit StructType (never infer — an inference pass would double-scan
  * 100 TB), then apply typed casts in [[Normalize]].
  */
object Schemas {

  /** Orders CSV raw read schema: leading unnamed pandas index column plus the
    * 10 projected columns (reference `etl/orders_etl.py:19-30`). All strings;
    * dirty values (`"1300,65"`, `"529629c"`) are normalized before casting.
    */
  val ordersCsvRaw: StructType = StructType(Seq(
    StructField("_idx", StringType),
    StructField("order_source_id", StringType),
    StructField("order_created_datetime", StringType),
    StructField("customer_id", StringType),
    StructField("status", StringType),
    StructField("sum", StringType),
    StructField("quantity", StringType),
    StructField("name", StringType),
    StructField("surname", StringType),
    StructField("patronymic", StringType),
    StructField("product_id", StringType)
  ))

  /** Columns the reference projects at scan time (`usecols`,
    * reference `etl/orders_etl.py:72`).
    */
  val ordersReadCols: Seq[String] = Seq(
    "order_source_id", "order_created_datetime", "customer_id", "status",
    "sum", "quantity", "name", "surname", "patronymic", "product_id")

  /** Products CSV raw schema (reference `etl/orders_etl.py:18,73-75`). */
  val productsCsvRaw: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("price", StringType),
    StructField("goods_group", StringType),
    StructField("manufacturer", StringType)
  ))

  val productsReadCols: Seq[String] =
    Seq("product_id", "price", "goods_group", "manufacturer")

  /** Typed orders schema after normalization
    * (reference `etl/orders_etl.py:34-42`). pandas `category` is a storage
    * detail → StringType (Parquet/Tungsten dictionary-encode automatically);
    * money stays DoubleType to mirror float64 semantics.
    */
  val orders: StructType = StructType(Seq(
    StructField("order_source_id", LongType),
    StructField("order_created_datetime", TimestampType),
    StructField("customer_id", LongType),
    StructField("status", StringType),
    StructField("sum", DoubleType),
    StructField("quantity", LongType),
    StructField("name", StringType),
    StructField("surname", StringType),
    StructField("patronymic", StringType),
    StructField("product_id", LongType)
  ))

  /** Typed products schema (reference `etl/orders_etl.py:43-48`). */
  val products: StructType = StructType(Seq(
    StructField("product_id", LongType),
    StructField("price", DoubleType),
    StructField("goods_group", StringType),
    StructField("manufacturer", StringType)
  ))
}
