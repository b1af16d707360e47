package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Readers
import graft.ops.TextDedup

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
    val K = TextDedup.NumHashes

    t("lsh_current") {
      val sigs = TextDedup.minhashSignatures(docs, "doc_id", "text", K)
      TextDedup.lshCandidatePairs(sigs, "doc_id", K).orderBy("doc_a", "doc_b")
    }
    t("lsh_shuffle_hint") {
      val sigs = TextDedup.minhashSignatures(docs, "doc_id", "text", K)
        .hint("shuffle_hash")
      TextDedup.lshCandidatePairs(sigs, "doc_id", K).orderBy("doc_a", "doc_b")
    }
    // aliased self-join: both sides are the same canonical subtree — does
    // ReusedExchange fire and halve the signature computation?
    def selfJoinPairs(): DataFrame = {
      val sigs = TextDedup.minhashSignatures(docs, "doc_id", "text", K)
      val sigCols = (0 until K).map(i => col(s"mh$i"))
      val bandStructs = (0 until K by TextDedup.BandSize).map { s =>
        struct(lit(s).as("band"),
          concat_ws("|", (s until s + TextDedup.BandSize).map(i => col(s"mh$i")): _*)
            .as("bkey"))
      }
      val bands = sigs.select(
          (col("doc_id").as("doc") +: explode(array(bandStructs: _*)).as("bb") +: sigCols): _*)
        .select((col("doc") +: col("bb.band").as("band") +: col("bb.bkey").as("bkey")
          +: sigCols): _*)
      val j = bands.as("x").join(bands.as("y").hint("shuffle_hash"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc") < col("y.doc"))
      val equalPositions = (0 until K)
        .map(i => when(col(s"x.mh$i") === col(s"y.mh$i"), 1).otherwise(0))
        .reduce(_ + _)
      j.select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
          (equalPositions.cast("double") / K).as("est_sim"))
        .distinct()
    }
    t("lsh_selfjoin")(selfJoinPairs().orderBy("doc_a", "doc_b"))
    val q2 = selfJoinPairs()
    q2.write.format("noop").mode("overwrite").save()
    println(q2.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Reused") || l.contains("Exchange") || l.contains("Join"))
      .mkString("\n"))
    spark.stop()
  }
}
