package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CdcChunksSpec extends AnyFunSuite {

  private def chunks(s: String, k: Int, bits: Int): Seq[String] =
    CdcChunksImpl.compute(s, k, bits).toArray[AnyRef](
      org.apache.spark.sql.types.StringType).toSeq.map(_.toString)

  private def gramHash(g: String): Long =
    g.codePoints().toArray.foldLeft(0L)((a, c) =>
      (a * RollingHashImpl.Base + c) % RollingHashImpl.Mod)

  /** Oracle-shaped reference: boundary after i iff the k-gram ending at i
    * hashes to 0 mod 2^bits.
    */
  private def reference(s: String, k: Int, bits: Int): Seq[String] = {
    val n = s.length // tests use BMP-only strings
    if (n == 0) return Seq.empty
    val mask = (1L << bits) - 1
    val bounds = (k until n).filter(i => (gramHash(s.substring(i - k, i)) & mask) == 0L)
    val edges = 0 +: bounds :+ n
    edges.sliding(2).map { case Seq(a, b) => s.substring(a, b) }.toSeq
  }

  test("chunks concatenate back to the input; no empty chunks") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val s = Array.fill(rnd.nextInt(300))(('a' + rnd.nextInt(4)).toChar).mkString
      val cs = chunks(s, 8, 4)
      assert(cs.mkString == s)
      assert(cs.forall(_.nonEmpty) || s.isEmpty)
      assert(cs == reference(s, 8, 4), s"mismatch for <$s>")
    }
  }

  test("empty and shorter-than-k inputs") {
    assert(chunks("", 8, 4).isEmpty)
    assert(chunks("abc", 8, 4) == Seq("abc")) // no window fits → one chunk
  }

  test("boundaries are content-defined: an insertion re-aligns the tail") {
    val rnd = new scala.util.Random(11)
    val body = Array.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val a = chunks(body, 16, 5)
    val b = chunks("INSERTED-PREFIX-" + body, 16, 5)
    // everything after the first re-synchronized boundary chunks
    // identically: the tails share all but the first few chunks
    val common = a.toSet.intersect(b.toSet)
    assert(common.size >= a.size - 2,
      s"only ${common.size} of ${a.size} chunks survived the insert")
    // a fixed-width splitter would share ~zero chunks after the shift
    val fixedA = body.grouped(32).toSet
    val fixedB = ("INSERTED-PREFIX-" + body).grouped(32).toSet
    assert(fixedA.intersect(fixedB).size <= 1)
  }

  test("expected chunk length tracks 2^bits") {
    val rnd = new scala.util.Random(5)
    val s = Array.fill(20000)(('a' + rnd.nextInt(26)).toChar).mkString
    val cs = chunks(s, 16, 5) // expected length 32
    val mean = s.length.toDouble / cs.size
    assert(mean > 16 && mean < 64, s"mean chunk $mean")
  }
}
