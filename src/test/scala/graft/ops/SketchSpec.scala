package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-sketch operators (HLL distinct counts, t-digest quantiles).
  * Sketch implementations differ across engines, so these are not
  * DuckDB-oracle queries — correctness is bounded-error against the exact
  * answer, the contract a 100 TB deployment actually relies on (sketches
  * aggregate with map-side partials; the exact versions shuffle far more).
  */
class SketchSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val (approx, exact) = li.agg(
      approx_count_distinct("l_partkey").as("a"),
      countDistinct("l_partkey").as("e"))
      .as[(Long, Long)].collect()(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx percentile brackets the exact median") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val approxMedian = li
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)))
      .as[Double].collect()(0)
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    assert(math.abs(approxMedian - exact) / exact < 0.01)
  }

  test("bloom h1 avalanche keeps sequential raw keys near nominal FPR") {
    // the SQL function accepts ANY bigint — un-prehashed sequential ids
    // must not cluster probe positions. 1k keys into 10k bits (~10
    // bits/key, 5 hashes) has nominal FPR ~1%; raw h1 = v blew this up.
    import graft.functions.BloomFilterOps
    val buf = BloomFilterOps.newBuffer(numBits = 10000L, numHashes = 5)
    (0L until 1000L).foreach(BloomFilterOps.put(buf, _))
    (0L until 1000L).foreach(v =>           // one-sided: never a false neg
      assert(BloomFilterOps.mightContain(buf, v)))
    val fp = (1000L until 11000L).count(BloomFilterOps.mightContain(buf, _))
    assert(fp < 300, s"sequential-key FPR ${fp / 10000.0} — h1 clustering")
  }

  test("KLL deserialize fails loudly on corrupt zero-level state") {
    import graft.functions.Kll
    // valid empty state round-trips (streaming state store restores these)
    val empty = Kll.deserialize(Kll.serialize(new Kll.KllState(64)))
    Kll.insert(empty, 1.0)                   // must not throw
    // corrupt: counted items but no levels → loud failure at decode, not
    // an IndexOutOfBounds at the next insert
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putInt(64); bb.putLong(7L); bb.putInt(0)
    val ex = intercept[IllegalArgumentException] {
      Kll.deserialize(bb.array())
    }
    assert(ex.getMessage.contains("corrupt"))
  }
}
