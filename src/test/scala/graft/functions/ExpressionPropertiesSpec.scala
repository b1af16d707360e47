package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based hardening for the hand-written native expressions —
  * the bit-twiddling O(n) implementations whose oracle checks certify
  * one dataset, not the algorithm. Each property pits the shipped
  * implementation against an independent naive reference (or a
  * metamorphic law) over randomized inputs, including supplementary-
  * plane code points where the implementation iterates code points.
  * Pure-JVM: no SparkSession, so hundreds of cases run in milliseconds.
  */
class ExpressionPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, cases: Int = 200): Unit = {
    // fixed seed: the gate must be deterministic — widen coverage by
    // raising `cases`, not by re-rolling seeds across runs
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(0x5eed5eedL)), prop)
    assert(res.passed, res.status.toString)
  }

  // small alphabet → frequent char collisions (JW matches, CDC
  // boundaries); the emoji and the astral letter force surrogate pairs
  private val smallAlpha: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', 'c', 'д', 'é')).map(_.mkString)
  private val astral: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "😀", "𝒜"))
      .map(_.mkString)

  private def naiveRolling(cps: Array[Int]): Long =
    cps.foldLeft(0L)((a, c) =>
      (a * RollingHashImpl.Base + c) % RollingHashImpl.Mod)

  test("rolling_hash equals the naive polynomial fold (incl. astral)") {
    check(Prop.forAll(Gen.oneOf(smallAlpha, astral)) { s =>
      RollingHashImpl.compute(s) == naiveRolling(s.codePoints().toArray)
    })
  }

  test("winnow fingerprints equal the naive per-window minimum set") {
    val gen = for {
      s <- Gen.oneOf(smallAlpha, astral)
      k <- Gen.choose(1, 5)
      w <- Gen.choose(1, 6)
    } yield (s, k, w)
    check(Prop.forAllNoShrink(gen) { case (s, k, w) =>
      val got = WinnowImpl.compute(s, k, w).toLongArray().toSet
      val cps = s.codePoints().toArray
      val m = cps.length - k + 1
      val expected =
        if (m <= 0) Set.empty[Long]
        else {
          // naive O(m·w): hash every k-gram independently, min per window
          val h = Array.tabulate(m)(i => naiveRolling(cps.slice(i, i + k)))
          val effW = math.min(w, m)
          (0 to m - effW).map(i => h.slice(i, i + effW).min).toSet
        }
      got == expected
    })
  }

  test("cdc_chunks: reconstruction, no empty chunks, naive boundary parity") {
    val gen = for {
      s <- Gen.oneOf(smallAlpha, astral)
      k <- Gen.choose(1, 4)
      bits <- Gen.choose(1, 4) // low bits → boundaries actually fire
    } yield (s, k, bits)
    check(Prop.forAllNoShrink(gen) { case (s, k, bits) =>
      val chunks = CdcChunksImpl.compute(s, k, bits).toArray[UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
      val cps = s.codePoints().toArray
      val mask = (1L << bits) - 1
      // independent boundary recomputation: window ENDING at i is
      // cps[i-k..i-1]; boundary iff its hash & mask == 0, for i in [k, n-1]
      val bounds = (k until cps.length)
        .filter(i => (naiveRolling(cps.slice(i - k, i)) & mask) == 0L)
      val edges = 0 +: bounds :+ cps.length
      val expected =
        if (cps.isEmpty) Seq.empty[String]
        else edges.sliding(2).collect { case Seq(a, b) =>
          new String(cps, a, b - a)
        }.toSeq
      chunks.mkString == s && chunks.forall(_.nonEmpty) &&
        chunks.toSeq == expected
    })
  }

  test("jaro_winkler: symmetry, identity, range") {
    val pair = for (a <- smallAlpha; b <- smallAlpha) yield (a, b)
    check(Prop.forAll(pair) { case (a, b) =>
      val ab = JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      val ba = JaroWinklerImpl.similarity(
        UTF8String.fromString(b), UTF8String.fromString(a))
      val aa = JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(a))
      ab == ba && ab >= 0.0 && ab <= 1.0 &&
        (a.isEmpty || aa == 1.0) && (a.isEmpty == (aa == 0.0))
    })
  }

  test("jaro_winkler: disjoint alphabets score zero") {
    val pair = for {
      a <- Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      b <- Gen.nonEmptyListOf(Gen.oneOf('x', 'y', 'z')).map(_.mkString)
    } yield (a, b)
    check(Prop.forAll(pair) { case (a, b) =>
      JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b)) == 0.0
    })
  }

  private def kllRankError(est: Double, q: Double, data: Array[Double])
  : Double = {
    val n = data.length.toDouble
    val lt = data.count(_ < est)
    val le = data.count(_ <= est)
    val target = q * n
    if (target < lt) (lt - target) / n
    else if (target > le) (target - le) / n
    else 0.0
  }

  test("kll: rank envelope holds across input distributions and orders") {
    // the fixed-dataset specs certify two streams; this certifies the
    // LAW over adversarial shapes — sorted, reversed, constant-heavy,
    // few-distinct — where a buggy compaction parity would bias ranks
    val gen = for {
      n <- Gen.choose(1000, 8000)
      shape <- Gen.oneOf("uniform", "sorted", "reversed", "fewDistinct",
        "constant")
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (n, shape, seed)
    check(Prop.forAllNoShrink(gen) { case (n, shape, seed) =>
      val rnd = new scala.util.Random(seed)
      val base = Array.fill(n)(rnd.nextDouble() * 1e6)
      val data = shape match {
        case "uniform" => base
        case "sorted" => base.sorted
        case "reversed" => base.sorted.reverse
        case "fewDistinct" => base.map(v => (v % 7).floor)
        case "constant" => Array.fill(n)(42.0)
      }
      val st = new Kll.KllState(200)
      data.foreach(Kll.insert(st, _))
      st.totalWeight == n.toLong &&
        Seq(0.01, 0.1, 0.5, 0.9, 0.99).forall { q =>
          kllRankError(Kll.quantile(st, q), q, data) <= 0.02
        }
    }, cases = 40)
  }

  test("kll: serialize/deserialize mid-stream is transparent to the rest") {
    // the streaming state store round-trips this format every batch: a
    // sketch that continues after a round trip must behave EXACTLY like
    // one that never serialized (both paths are deterministic)
    val gen = for {
      nBefore <- Gen.choose(0, 4000)
      nAfter <- Gen.choose(1, 4000)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (nBefore, nAfter, seed)
    check(Prop.forAllNoShrink(gen) { case (nBefore, nAfter, seed) =>
      val rnd = new scala.util.Random(seed)
      val before = Array.fill(nBefore)(rnd.nextDouble())
      val after = Array.fill(nAfter)(rnd.nextDouble())
      val direct = new Kll.KllState(64)
      before.foreach(Kll.insert(direct, _))
      val tripped = Kll.deserialize(Kll.serialize({
        val s = new Kll.KllState(64)
        before.foreach(Kll.insert(s, _))
        s
      }))
      after.foreach { v =>
        Kll.insert(direct, v); Kll.insert(tripped, v)
      }
      Seq(0.1, 0.5, 0.9).forall(q =>
        Kll.quantile(direct, q) == Kll.quantile(tripped, q)) &&
        direct.totalWeight == tripped.totalWeight
    }, cases = 40)
  }

  test("bloom filter: no false negatives at any shape") {
    val gen = for {
      keys <- Gen.listOf(Gen.long)
      bits <- Gen.choose(64L, 4096L)
      hashes <- Gen.choose(1, 8)
    } yield (keys, bits, hashes)
    check(Prop.forAllNoShrink(gen) { case (keys, bits, hashes) =>
      val buf = BloomFilterOps.newBuffer(bits, hashes)
      keys.foreach(BloomFilterOps.put(buf, _))
      keys.forall(BloomFilterOps.mightContain(buf, _))
    })
  }

  test("char_profile lanes equal the regexp_replace spellings they replaced") {
    // alphabet deliberately spans every branch of the byte walk: ASCII,
    // each Java-\\s whitespace char (incl. \\x0B, which RE2's \\s lacks --
    // the profile must match JAVA semantics, the spelling Spark ran),
    // 2-byte inside (Arabic) AND outside (e-acute, Cyrillic) the Arabic
    // range, 3-byte in each script range (Han/kana/Hangul/Devanagari/
    // Thai), 3-byte outside all ranges (fullwidth yen; U+9FFF is the
    // LAST Han char), astral
    val chars = Gen.oneOf("a", "Z", "9", " ", "\t", "\n", "\u000B", "\f",
      "\r", "\u00e9", "\u0434", "\u4e2d", "\u6587", "\u4e00", "\u9fff",
      "\u3042", "\u30a2", "\uac00", "\u0628", "\u0915", "\u0e01",
      "\uffe5", "\ud83d\ude00", "\ud835\udc9c")
    val strGen = Gen.listOf(chars).map(_.mkString)
    val ranges = Seq("\\x{4e00}-\\x{9fff}", "\\x{3040}-\\x{30ff}",
      "\\x{ac00}-\\x{d7af}", "\\x{0600}-\\x{06ff}",
      "\\x{0900}-\\x{097f}", "\\x{0e00}-\\x{0e7f}")
    def cpCount(kept: String): Long =
      kept.codePointCount(0, kept.length).toLong
    check(Prop.forAll(strGen) { s =>
      val c = CharProfileImpl.counts(UTF8String.fromString(s))
      c(0) == cpCount(s.replaceAll("\\s", "")) &&
        ranges.zipWithIndex.forall { case (r, i) =>
          c(i + 1) == cpCount(s.replaceAll(s"[^$r]", ""))
        }
    })
  }

  test("char_profile route: packing and priority") {
    def routed(s: String): (Int, Long, Long) = {
      val p = CharProfileImpl.compute(UTF8String.fromString(s))
      ((p >>> 60).toInt, (p >>> 32) & 0x0fffffffL, p & 0xffffffffL)
    }
    // pure scripts route their language's id with count = numerator
    assert(routed("\u4e2d\u6587\u4e2d") == ((2, 3L, 3L)))      // zh
    assert(routed("\uac00\uac01\uac02\uac03") == ((3, 4L, 4L))) // ko
    assert(routed("\u0628\u0628\u0628") == ((4, 3L, 3L)))      // ar
    assert(routed("\u0915\u0916\u0917") == ((5, 3L, 3L)))      // hi
    assert(routed("\u0e01\u0e02\u0e04") == ((6, 3L, 3L)))      // th
    // ja priority: Han-MAJORITY text with kana presence routes ja, and
    // the numerator is kana+han (the combined CJK mass) -- without the
    // presence rule this exact string would read zh
    val jaMixed = "\u65e5\u672c\u8a9e\u3042" + "\u4e2d" * 12
    val c = CharProfileImpl.counts(UTF8String.fromString(jaMixed))
    assert(c(2) * CharProfileImpl.KanaDen >= c(0), "kana presence holds")
    assert(c(1) * 10 >= 3 * c(0), "han alone also clears the bar")
    val (sid, num, _) = routed(jaMixed)
    assert(sid == 1, "kana presence routes ja ahead of zh")
    assert(num == c(1) + c(2))
    // below both bars: no route (sid 0), the word layer decides
    assert(routed("hello world")._1 == 0)
    // integer-exact boundary: 3 of 10 non-space chars IS >= 30%...
    assert(routed("\u0e01\u0e01\u0e01abcdefg")._1 == 6)
    // ...and 2 of 7 (28.6%) is not
    assert(routed("\u0e01\u0e01abcde")._1 == 0)
    // whitespace is excluded from the denominator
    assert(routed("\u0e01 \u0e02 \u0e04")._1 == 6)
    // empty / all-space: nonspace 0, nothing routes
    assert(routed("") == ((0, 0L, 0L)))
    assert(routed("   ")._1 == 0)
  }
}
