package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.security.MessageDigest

/** [[CurationQueries.splitRebalance]] certification on a planted corpus
  * plus the driver fixture:
  *
  *  - the repair invariant: `leaked_fps_after` is ZERO — every audited
  *    span fingerprint's docs share a connected component, hence a side;
  *  - the planted corpus forces a cross-boundary duplicate under the
  *    naive hash-by-doc split (ids chosen by computing the md5 buckets
  *    in the spec itself), so `leaked_fps_before` > 0 proves the audit
  *    sees the leak the repair then removes, and `docs_moved` > 0
  *    proves the repair actually moved something;
  *  - doc conservation: per-split `n_docs` sums to the corpus size.
  */
class SplitRebalanceSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  /** Mirror of [[graft.ops.Sampling.hashBucket]] for picking fixture ids. */
  private def bucket(key: String, outOf: Int): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % outOf
  }

  // 24-word sentences; two docs share the full text (hence every 8-token
  // span), the rest are span-disjoint
  private def sentence(prefix: String): String =
    (1 to 24).map(i => s"$prefix$i").mkString(" ")

  private def fixtureDir(): String = {
    import spark.implicits._
    // one train-side id and one val-side id under the naive split carry
    // the SAME text (the planted leak); fillers are unique
    val ids = (1L to 400L)
    val trainId = ids.find(i => bucket(i.toString, 100) < 90).get
    val valId = ids.find(i => bucket(i.toString, 100) >= 90).get
    assert(trainId != valId)
    val filler = ids.filterNot(i => i == trainId || i == valId).take(6)
    val rows =
      Seq((trainId, "en", "src1", sentence("dup")),
        (valId, "en", "src1", sentence("dup"))) ++
        filler.map(i => (i, "en", "src1", sentence(s"solo$i")))
    val dir = Files.createTempDirectory("split_rebalance_fix").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted cross-boundary duplicate: before > 0, after == 0, docs move") {
    val rows = CurationQueries.splitRebalance(spark, fixtureDir()).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 8L)
    assert(rows.forall(_.getAs[Long]("leaked_fps_after") == 0L),
      s"repair left leakage: ${rows.mkString("; ")}")
    assert(rows.forall(_.getAs[Long]("leaked_fps_before") > 0L),
      s"fixture failed to plant a naive-split leak: ${rows.mkString("; ")}")
    assert(rows.map(_.getAs[Long]("docs_moved")).sum > 0L,
      "repair reported zero moved docs on a leaking fixture")
  }

  test("driver corpus: leakage is zero after repair and docs are conserved") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = CurationQueries.splitRebalance(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 2)
    assert(rows.forall(_.getAs[Long]("leaked_fps_after") == 0L),
      s"repair left leakage: ${rows.mkString("; ")}")
    val total = graft.etl.Readers.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // components never split across sides, so there can be no more
    // clusters than docs and at least one per doc ratio sanity
    rows.foreach { r =>
      assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs"))
    }
  }
}
