package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {

  private def winnow(s: String, k: Int, w: Int): Set[Long] =
    WinnowImpl.compute(s, k, w).toLongArray().toSet

  /** Reference k-gram hash: the plain polynomial fold the DuckDB oracle
    * uses — the rolling computation must agree gram for gram.
    */
  private def gramHash(g: String): Long =
    g.codePoints().toArray.foldLeft(0L)((a, c) =>
      (a * RollingHashImpl.Base + c) % RollingHashImpl.Mod)

  private def reference(s: String, k: Int, w: Int): Set[Long] = {
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) Set.empty
    else {
      val h = (0 until m).map(i => gramHash(new String(cps, i, k)))
      val effW = math.min(w, m)
      (0 until math.max(m - effW + 1, 1)).map(j =>
        h.slice(j, j + effW).min).toSet
    }
  }

  test("hand example: mins of each window, distinct") {
    // "abcdab": 3-grams abc bcd cda dab; window 2 → min(h1,h2), min(h2,h3),
    // min(h3,h4)
    val h = Seq("abc", "bcd", "cda", "dab").map(gramHash)
    val expected = Set(h(0) min h(1), h(1) min h(2), h(2) min h(3))
    assert(winnow("abcdab", 3, 2) == expected)
  }

  test("degenerate sizes: shorter than k empty; fewer grams than window") {
    assert(winnow("ab", 3, 4) == Set.empty)
    // 4 chars, k=3 → 2 grams < w=4 → ONE window over both
    val h = Seq("abc", "bcd").map(gramHash)
    assert(winnow("abcd", 3, 4) == Set(h.min))
  }

  test("rolling hashes agree with the per-gram polynomial fold (oracle form)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val s = Array.fill(rnd.nextInt(40))((' ' + rnd.nextInt(95)).toChar).mkString
      val k = 1 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(5)
      assert(winnow(s, k, w) == reference(s, k, w), s"<$s> k=$k w=$w")
    }
  }

  test("guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    def rs(n: Int) = Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    for (_ <- 1 to 200) {
      val shared = rs(12) // 12 >= w+k-1
      val x = rs(rnd.nextInt(30)) + shared + rs(rnd.nextInt(30))
      val y = rs(rnd.nextInt(30)) + shared + rs(rnd.nextInt(30))
      val (k, w) = (8, 5) // threshold w+k-1 = 12
      val common = winnow(x, k, w).intersect(winnow(y, k, w))
      assert(common.nonEmpty, s"no shared fingerprint for <$x> <$y>")
    }
  }

  test("density: fingerprint count stays near 2/(w+1) of the gram count") {
    val rnd = new scala.util.Random(7)
    val s = Array.fill(5000)(('a' + rnd.nextInt(26)).toChar).mkString
    val m = s.length - 8 + 1
    val density = winnow(s, 8, 4).size.toDouble / m
    assert(density > 0.25 && density < 0.55, s"density $density") // E = 0.4
  }
}
