package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Intrinsic laws of the curation fan-out operators on a randomized
  * corpus (fixed seed) — properties the oracle's fixed fixtures can't
  * sweep: chunk tiling must cover every token exactly under the
  * stride/size arithmetic for ALL lengths around the boundaries, and
  * shard packing must place each doc by its exclusive prefix with
  * contiguous shard ids whenever no doc exceeds the budget.
  */
class CurationLawsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(42)
  // lengths sweep the chunk boundaries: 1, size-1, size, size+1, the
  // stride lattice, plus random tails
  private val lengths =
    Seq(1, 2, 47, 48, 49, 63, 64, 65, 111, 112, 113, 160) ++
      Seq.fill(60)(1 + rnd.nextInt(300))
  private val docs = lengths.zipWithIndex.map { case (n, i) =>
    (i.toLong, (1 to n).map(t => s"w$t").mkString(" "),
      s"lang${i % 3}", n.toLong)
  }

  test("chunkTokens tiles every document: stride starts, full coverage, exact text") {
    val out = Curation.chunkTokens(
        docs.toDF("doc_id", "text", "lang", "n"), "doc_id", "text",
        size = 64, stride = 48)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((id, _, _, n) <- docs) {
      val chunks = out(id)
      // contiguous ids from 0; the LAST chunk's end is exactly n, every
      // earlier chunk is full-size
      assert(chunks.map(_._2) === (0L until chunks.size).toSeq)
      chunks.init.foreach { c => assert(c._3 === 64L, s"doc $id chunk ${c._2}") }
      val last = chunks.last
      assert(last._2 * 48 + last._3 === n, s"doc $id tail coverage")
      // the number of chunks is the documented ceil arithmetic
      val expected = if (n <= 64) 1L else 1L + (n - 64 + 47) / 48
      assert(chunks.size.toLong === expected, s"doc $id chunk count")
      // chunk text is exactly the stride slice
      chunks.foreach { case (_, cid, len, text) =>
        val s = (cid * 48).toInt
        assert(text === (s + 1 to s + len.toInt).map(t => s"w$t").mkString(" "),
          s"doc $id chunk $cid text")
      }
    }
  }

  test("packShards places docs by exclusive prefix with contiguous shard ids") {
    val budget = 500L
    val out = Curation.packShards(
        docs.toDF("doc_id", "text", "lang", "n_tokens"),
        col("lang"), col("doc_id"), col("n_tokens"), budget)
      .select("lang", "doc_id", "n_tokens", "cum_tokens", "shard")
      .as[(String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((lang, rows) <- out) {
      var prefix = 0L
      var lastShard = 0L
      for ((_, id, n, cum, shard) <- rows) {
        assert(cum === prefix + n, s"$lang doc $id running total")
        assert(shard === prefix / budget, s"$lang doc $id shard placement")
        // all docs here are < budget, so ids never skip
        assert(shard === lastShard || shard === lastShard + 1,
          s"$lang doc $id shard contiguity")
        lastShard = shard
        prefix = cum
      }
      // every non-final shard is filled to its boundary: the first doc of
      // shard s+1 has exclusive prefix >= (s+1) * budget by construction
      assert(prefix === rows.map(_._3).sum)
    }
  }
}
