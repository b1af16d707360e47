package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Readers

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

    val docs = Readers.table(spark, sfDir, "documents")
    val k = graft.ops.TextDedup.NumHashes
    val sh = docs.select(col("doc_id"),
      explode(graft.ops.TextDedup.shingles(col("text"), 3)).as("s"))

    def stringMins = (0 until k).map { i =>
      min(substring(md5(concat(lit(s"s${i / 4}|"), col("s"))),
        (i % 4) * 8 + 1, 8)).as(s"mh$i")
    }
    def convMins = (0 until k).map { i =>
      min(conv(substring(md5(concat(lit(s"s${i / 4}|"), col("s"))),
        (i % 4) * 8 + 1, 8), 16, 10).cast("long")).as(s"mh$i")
    }
    t("sig_string_min")(sh.groupBy("doc_id").agg(stringMins.head, stringMins.tail: _*)
      .orderBy("doc_id"))
    t("sig_conv_min")(sh.groupBy("doc_id").agg(convMins.head, convMins.tail: _*)
      .orderBy("doc_id"))
    // where does the time actually go? shingle explode alone, and md5 alone
    t("shingle_explode_count")(sh.groupBy("doc_id").agg(count(lit(1)).as("n")))
    t("md5_once")(sh.select(col("doc_id"), md5(concat(lit("s0|"), col("s"))).as("h"))
      .groupBy("doc_id").agg(min(substring(col("h"), 1, 8)).as("m")))
    // pre-split words into a bound attribute so split() runs once per doc,
    // not once per element_at call inside the transform lambda
    val n = 3
    val shPre = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(when(size(col("w")) >= n,
          transform(sequence(lit(0), size(col("w")) - n),
            i => concat_ws(" ",
              (0 until n).map(o => element_at(col("w"), i + lit(o + 1))): _*)))
          .otherwise(array())).as("s"))
    t("shingle_presplit_count")(shPre.groupBy("doc_id").agg(count(lit(1)).as("n")))
    t("sig_conv_presplit")(shPre.groupBy("doc_id").agg(convMins.head, convMins.tail: _*)
      .orderBy("doc_id"))
    spark.stop()
  }
}
