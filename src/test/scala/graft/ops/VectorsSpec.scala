package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("dot and cosine on known vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),   // orthogonal
      (Seq(1.0f, 2.0f, 2.0f), Seq(1.0f, 2.0f, 2.0f)),   // identical
      (Seq(1.0f, 0.0f, 0.0f), Seq(-1.0f, 0.0f, 0.0f))   // opposite
    ).toDF("a", "b")
    val out = df.select(
      Vectors.dot($"a", $"b").as("dot"),
      round(Vectors.cosine($"a", $"b"), 9).as("cos"))
      .as[(Double, Double)].collect()
    assert(out(0) == ((0.0, 0.0)))
    assert(out(1)._1 == 9.0 && out(1)._2 == 1.0)
    assert(out(2) == ((-1.0, -1.0)))
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val candidates = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("query_id", "q_emb")
    val out = Vectors.bruteForceTopK(queries, candidates, 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    // cos=1.0 for ids 1 and 4 → tiebreak by id; then id 2
    assert(out.map(_._3).toSeq == Seq(1L, 4L, 2L))
    assert(out(0)._4 == 1.0)
  }

  test("nearestNeighborExact: zero-norm vectors fall back to lowest id, null cos") {
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f)),              // zero norm: every pair null cos
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = Vectors.nearestNeighborExact(vecs, "vec_id")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (2L, None))          // lowest other id, null score
    assert(out(2L)._1 == 3L && out(2L)._2.isDefined)
    assert(out(3L)._1 == 2L)
  }

  test("lshSignature: identical vectors share buckets, opposites do not") {
    val vecs = Seq(
      (1L, Seq.tabulate(64)(i => (i % 7 - 3).toFloat)),
      (2L, Seq.tabulate(64)(i => (i % 7 - 3).toFloat)),          // identical
      (3L, Seq.tabulate(64)(i => -(i % 7 - 3).toFloat))          // negated
    ).toDF("vec_id", "embedding")
    val sig = vecs
      .withColumn("sig", Vectors.lshSignature($"embedding", 8, 64))
      .as[(Long, Seq[Float], Long)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(sig(1L) == sig(2L))
    // a negated vector flips every non-zero projection's bit; zero
    // projections (possible by construction) keep the bit at 0 on both
    assert(sig(1L) != sig(3L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) >= 4)
    assert(sig.values.forall(s => s >= 0 && s < 256))
  }

  test("hyperplaneSigns are ±1, deterministic, and plane-distinct") {
    val a = Vectors.hyperplaneSigns(0, 64)
    val b = Vectors.hyperplaneSigns(1, 64)
    assert(a.toSeq == Vectors.hyperplaneSigns(0, 64).toSeq)
    assert(a.forall(s => s == 1.0f || s == -1.0f))
    assert(a.toSeq != b.toSeq)
  }

  test("assignToCentroids picks the nearest centroid") {
    val vectors = Seq(
      (10L, Seq(1.0f, 0.05f)), (11L, Seq(0.05f, 1.0f)), (12L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))
    ).toDF("centroid_id", "c_emb")
    val out = Vectors.assignToCentroids(vectors, "vec_id", centroids)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(out(10L) == 0L)
    assert(out(11L) == 1L)
    assert(out(12L) == 1L)  // -x axis: cos −1 vs 0 → centroid 1 wins
  }

  test("scalarQuantize: range endpoints reconstruct exactly, codes bounded") {
    // dim 0 spans [0,1]; dim 1 is constant (zero scale → code 0, exact)
    val vecs = Seq(
      (1L, Seq(0.0f, 5.0f)), (2L, Seq(1.0f, 5.0f)), (3L, Seq(0.5f, 5.0f))
    ).toDF("vec_id", "embedding")
    val out = Vectors.scalarQuantize(vecs, "vec_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // endpoints: code 0 and 255 → zero reconstruction error on both dims
    assert(out(1L)._2 == 0L && out(1L)._3 == 0.0)
    assert(out(2L)._2 == 255L && out(2L)._3 == 0.0)
    // midpoint: code 128 (0.5*255 = 127.5 rounds half-up), small error
    assert(out(3L)._2 == 128L && out(3L)._3 > 0.0 && out(3L)._3 < 1e-4)
  }

  test("kmeansLloyd: centroids move to cluster means; assignment splits") {
    // two tight clusters on the +x / +y axes; init centroids are one
    // member of each (ids 0 and 1), as kmeans_refine seeds from vec_id < K
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (10L, Seq(0.9f, 0.1f)), (11L, Seq(1.1f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)), (20L, Seq(0.1f, 0.9f)), (21L, Seq(0.0f, 1.1f))
    ).toDF("vec_id", "embedding")
    val init = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("centroid_id"),
        $"embedding".cast("array<double>").as("c_emb"))
    val cents = Vectors.kmeansLloyd(vecs, "vec_id", init, iterations = 2)
      .as[(Long, Seq[Double])].collect().toMap
    // centroid 0 = mean of the three +x members (rounded at 1e-9)
    assert(cents(0L).head == math.floor((1.0 + 0.9 + 1.1) / 3 * 1e9 + 0.5) / 1e9 ||
      math.abs(cents(0L).head - 1.0) < 1e-6)
    assert(cents(0L)(1) < 0.1 && cents(1L)(1) > 0.9)
    val assigned = Vectors.nearestCentroid(vecs, "vec_id", init.toDF())
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(assigned(10L) == 0L && assigned(11L) == 0L)
    assert(assigned(20L) == 1L && assigned(21L) == 1L)
  }

  test("kmeansLloyd: a centroid that loses every member keeps its position") {
    // all points hug +x; centroid 1 starts on +y and attracts nobody
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (10L, Seq(0.9f, 0.0f)), (11L, Seq(1.1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val init = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))
    ).toDF("centroid_id", "c_emb")
    val cents = Vectors.kmeansLloyd(vecs, "vec_id", init, iterations = 1)
      .as[(Long, Seq[Double])].collect().toMap
    assert(cents(1L) == Seq(0.0, 1.0)) // untouched
    assert(cents(0L)(0) > 0.9)         // moved to the member mean
  }
}
