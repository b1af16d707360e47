package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Readers
import graft.ops.Vectors

/** Dev scratchpad for plan/perf experiments. Not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(df: => DataFrame): Unit = {
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val emb = Readers.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val a = emb.withColumn("_na", Vectors.norm(col("embedding")))
    val b = emb.select(col("vec_id").as("_nn_id"), col("embedding").as("_nn_emb"))
      .withColumn("_nb", Vectors.norm(col("_nn_emb")))

    t("cross_count")(a.crossJoin(b).filter(col("_nn_id") =!= col("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n")))
    t("cross_dot")(a.crossJoin(b).filter(col("_nn_id") =!= col("vec_id"))
      .select(col("vec_id"),
        Vectors.dot(col("embedding"), col("_nn_emb")).as("d"))
      .groupBy("vec_id").agg(max("d").as("m")))
    t("full_neardup")(Vectors.nearestNeighborExact(emb, "vec_id").orderBy("vec_id"))
    val nd = Vectors.nearestNeighborExact(emb, "vec_id")
    nd.write.format("noop").mode("overwrite").save()
    println(nd.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
