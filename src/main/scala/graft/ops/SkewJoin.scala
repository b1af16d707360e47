package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A shuffle join sends every row of a key to one reducer; a hot key (one
  * customer with 10⁹ orders) serializes on that reducer. Salting splits
  * each hot key across `saltBuckets` reducers: the fact side gets a
  * deterministic data-derived salt in [0, n); the dimension side is
  * replicated n× (one copy per salt value); the join key becomes
  * (key, salt). Results are identical to the unsalted join — only the
  * shuffle distribution changes.
  *
  * AQE's skew-join handling covers many cases post-hoc by splitting
  * oversized partitions; explicit salting remains the tool when a single
  * *key* (not partition) is hot, which AQE cannot subdivide for a
  * sort-merge join.
  */
object SkewJoin {

  /** Left join with the right (dimension) side replicated per salt bucket.
    * `saltExpr` must be deterministic from the left row's data (never
    * rand() — breaks retry/replay semantics at scale).
    */
  def saltedLeftJoin(left: DataFrame, right: DataFrame, key: String,
                     saltExpr: Column, saltBuckets: Int): DataFrame = {
    val salted = left.withColumn("_salt", pmod(saltExpr, lit(saltBuckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), "left").drop("_salt")
  }
}
