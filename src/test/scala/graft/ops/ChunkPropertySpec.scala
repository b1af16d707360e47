package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive property sweep for the token chunker: coverage, boundary,
  * and the stride==size partition identity, for every (n ≤ 40, size ≤ 8,
  * stride ≤ size) combination. All n-values for one (size, stride) ride a
  * single DataFrame, so the sweep is a handful of Spark jobs, not
  * hundreds.
  */
class ChunkPropertySpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val MaxN = 40

  private def docs = (1 to MaxN)
    .map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
    .toDF("doc_id", "text") // doc_id == its token count

  test("chunks cover every token, end at the doc end, never exceed size") {
    for (size <- 1 to 8; stride <- 1 to size) {
      val byDoc = Curation.chunkTokens(docs, "doc_id", "text", size, stride)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      for (n <- 1 to MaxN) {
        val chunks = byDoc(n.toLong)
        assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong))
        chunks.foreach { case (_, cid, nTok, body) =>
          val toks = body.split(" ").toSeq
          assert(toks.size == nTok && nTok <= size,
            s"n=$n size=$size stride=$stride cid=$cid")
          assert(toks == (cid * stride + 1 to cid * stride + nTok)
            .map(i => s"t$i"))
        }
        // last chunk reaches the final token; coverage has no holes
        assert(chunks.last._4.split(" ").last == s"t$n",
          s"n=$n size=$size stride=$stride")
        val covered = chunks.flatMap { case (_, cid, nTok, _) =>
          (cid * stride) until (cid * stride + nTok) }.toSet
        assert(covered == (0L until n.toLong).toSet,
          s"n=$n size=$size stride=$stride")
      }
    }
  }

  test("stride == size partitions the document exactly") {
    for (size <- 1 to 8) {
      val rebuilt = Curation.chunkTokens(docs, "doc_id", "text", size, size)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._4).mkString(" ")).toMap
      for (n <- 1 to MaxN)
        assert(rebuilt(n.toLong) == (1 to n).map(i => s"t$i").mkString(" "))
    }
  }
}
