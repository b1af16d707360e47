package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Drop-in equivalent of the reference's `OrdersEtl` class
  * (reference `etl/orders_etl.py:10-198`): same constructor shape, same
  * three entry points (`process`, `write`, `findSimilarProducts`), Spark
  * semantics underneath.
  *
  * Differences by design:
  *   - `process()` builds one lazy DAG instead of materializing each stage;
  *   - the sink targets the warehouse abstraction of [[Sink]] (Parquet
  *     overwrite ≡ BigQuery `if_exists="replace"`; swap in the
  *     spark-bigquery-connector on a connected cluster);
  *   - `findSimilarProducts` evaluates the score as a broadcast column
  *     expression and collects only the (id, score) pairs.
  */
class OrdersEtl(spark: SparkSession, ordersCsv: String, productsCsv: String,
                warehouseRoot: String, tableName: String) {

  /** Typed, deduped, cleaned, denormalized output (reference `process()`,
    * stages 1–8). Lazy — nothing runs until an action.
    */
  lazy val processedOrders: DataFrame = Pipeline.processedOrders(spark, ordersCsv)
  lazy val processedProducts: DataFrame = Pipeline.processedProducts(spark, productsCsv)
  lazy val output: DataFrame = Pipeline.joinFrames(processedOrders, processedProducts)

  /** Reference `process()` — returns the denormalized table. */
  def process(): DataFrame = output

  /** Reference `write_to_bq(if_exists="replace")`. */
  def write(): Unit = Sink.overwriteTable(output, warehouseRoot, tableName)

  /** Reference `find_similar_products`: `Map(candidate_id -> score)`.
    * Throws if the target id is absent, matching the reference's
    * `IndexError` contract (reference `etl/orders_etl.py:105`).
    */
  def findSimilarProducts(targetId: Long,
                          candidateIds: Seq[Long]): Map[Long, Double] = {
    require(
      !processedProducts.filter(processedProducts("product_id") === targetId).isEmpty,
      s"target product $targetId not found")
    Similarity.findSimilar(processedProducts, targetId, candidateIds)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
  }
}
