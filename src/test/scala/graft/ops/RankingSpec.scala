package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Ranking]] bit-equal to the single-task window functions it
  * replaces, across the arithmetic edge cases SQL ntile is defined by
  * (ragged n % k, n < k, heavy ties on the leading key), plus the
  * determinism the distributed form must add (two evaluations of the
  * same plan agree — the reason split points come from a sketch, not
  * `repartitionByRange` sampling).
  */
class RankingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // deterministic data with deliberate structure: ~30% tie mass on a few
  // values (split-point ties must stay contiguous), unique tiebreaker id
  private def mk(n: Int) = {
    val rnd = new scala.util.Random(42 + n)
    (0 until n).map { i =>
      val v = if (rnd.nextDouble() < 0.3) (rnd.nextInt(3) * 100).toDouble
              else rnd.nextDouble() * 1000
      (i.toLong, v)
    }.toDF("id", "v").repartition(7)
  }

  test("withNtile matches the SQL window ntile on ragged and tiny sizes") {
    for (n <- Seq(1, 3, 7, 40, 1000); k <- Seq(1, 3, 4, 7, 50)) {
      val df = mk(n)
      val got = Ranking
        .withNtile(df, Seq(col("v"), col("id")), k, "q")
        .select("id", "q").as[(Long, Int)].collect().toMap
      val want = df
        .withColumn("q", ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "q").as[(Long, Int)].collect().toMap
      assert(got == want, s"ntile($k) diverged at n=$n")
    }
  }

  test("withGlobalRowNumber matches the unpartitioned row_number") {
    val df = mk(500)
    val got = Ranking
      .withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long") - 1L)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("all-ties leading key still ranks exactly (degenerate single range)") {
    // every split point equals the key: strict < sends everything to
    // range 0 — degraded parallelism, never a wrong rank
    val df = (0L until 100L).map(i => (i, 5.0)).toDF("id", "v").repartition(5)
    val got = Ranking
      .withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got == (0L until 100L).map(i => i -> i).toMap)
  }

  test("two actions on one ranked plan agree (deterministic split points)") {
    // the hazard that rules out raw repartitionByRange + spark_partition_id:
    // its SAMPLED bounds may differ between evaluations of the same plan,
    // silently mis-aligning offsets. Sketch-derived bounds are a pure
    // function of the data, so re-evaluation is safe by construction.
    val ranked = Ranking.withNtile(mk(800), Seq(col("v"), col("id")), 4, "q")
    val a = ranked.groupBy("q").count().as[(Int, Long)].collect().sortBy(_._1)
    val b = ranked.groupBy("q").count().as[(Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).sum == 800L)
  }

  test("descending order columns are refused (contract, not silent wrong)") {
    val e = intercept[IllegalArgumentException] {
      Ranking.withGlobalRowNumber(mk(10), Seq(col("v").desc), "rn")
    }
    assert(e.getMessage.contains("ASCENDING"))
  }

  test("an explicit rangeKey proxy lifts the ascending restriction exactly") {
    // (v DESC, id) ranked via the proxy -v: the distributed ranks must
    // match the single-window descending row_number bit-for-bit, ties and
    // all (tied v collapse into one range; order inside comes from id)
    val df = mk(600)
    val got = Ranking
      .withGlobalRowNumber(df, Seq(col("v").desc, col("id")), "rn",
        rangeKey = -col("v"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("v").desc, col("id"))).cast("long") - 1L)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withRunningSum matches the inclusive window prefix sum, long-exact") {
    // long values: the distributed cumsum must stay in LongType (no
    // double round-trip) and agree at every row, including the all-ties
    // degenerate range
    val df = mk(700).withColumn("c", (col("v") * 100).cast("long"))
    val got = Ranking
      .withRunningSum(df, Seq(col("v"), col("id")), col("c"), "cum")
    assert(got.schema("cum").dataType ===
      org.apache.spark.sql.types.LongType)
    val gotMap = got.select("id", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotMap == want)
    // descending via proxy — the abc_classification shape
    val gotDesc = Ranking
      .withRunningSum(df, Seq(col("v").desc, col("id")), col("c"), "cum",
        rangeKey = Some(-col("v")))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val wantDesc = df.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("v").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotDesc == wantDesc)
  }

  test("withRunningMinExclusive matches the strictly-preceding window min") {
    val df = mk(700)
    val got = Ranking
      .withRunningMinExclusive(df, Seq(col("v"), col("id")), col("v"), "m")
      .select("id", "m").as[(Long, Option[Double])].collect().toMap
    val want = df.withColumn("m",
        min(col("v")).over(Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("id", "m").as[(Long, Option[Double])].collect().toMap
    assert(got == want)
    // the global first row (and only it) has no predecessor
    assert(got.values.count(_.isEmpty) == 1)
  }

  test("withPartitionedRowNumber matches the naive partitioned window under skew") {
    // 70% of rows on ONE key (the power-law shape that funnels a naive
    // partitioned window through one task), plus small keys and a null
    // key partition; total order via the id tiebreak
    val rnd = new scala.util.Random(3)
    val rows = (0 until 900).map { i =>
      val k: java.lang.Long =
        if (i % 10 < 7) 42L
        else if (i % 10 == 9) null
        else (i % 10).toLong
      (i.toLong, k, rnd.nextDouble())
    }
    val df = rows.toDF("id", "k", "v")
    val got = Ranking
      .withPartitionedRowNumber(df, Seq(col("k")),
        Seq(col("v"), col("id")), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("withPartitionedRunningSums matches the naive partitioned running sum") {
    // the null contract is the hard part: a key whose prefix has no
    // non-null values must be null (not 0), even when EARLIER keys
    // contributed to the global prefix — plus the 70%-mass key, null
    // keys, and negative values
    val rnd = new scala.util.Random(5)
    val rows = (0 until 900).map { i =>
      val k: java.lang.Long =
        if (i % 10 < 7) 42L
        else if (i % 10 == 9) null
        else (i % 10).toLong
      val c: java.lang.Long =
        if (rnd.nextDouble() < 0.2) null else (rnd.nextInt(100) - 50).toLong
      (i.toLong, k, c, rnd.nextDouble())
    }
    val df = rows.toDF("id", "k", "c", "v")
    val got = Ranking
      .withPartitionedRunningSums(df, Seq(col("k")),
        Seq(col("v"), col("id")),
        Seq((col("c"), "cs"), (lit(1L), "cn")))
      .select("id", "cs", "cn")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val w = Window.partitionBy("k").orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df
      .withColumn("cs", sum(col("c")).over(w))
      .withColumn("cn", sum(lit(1L)).over(w))
      .select("id", "cs", "cn")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got == naive)
  }

  test("composite integral keys ride the packed default proxy: rank and " +
    "running sums match naive windows with null keys, NaN order, ties") {
    // the r12 library default: Seq(k1, k2) packs lexicographically from
    // runtime bounds + order fraction — previously the split collapsed
    // to NDV(k1) ranges. Parity is the contract; the fixture plants the
    // hazards that broke earlier drafts of the rewrite-rule twin: null
    // keys (slot −1 vs greatest/least null-skip), NaN in the order head
    // (nanvl-before-clamp), heavy ties, an all-null value group.
    val rnd = new scala.util.Random(17)
    val rows = (0 until 600).map { i =>
      val k1: java.lang.Integer = if (i % 11 == 0) null else i % 2
      val k2: java.lang.Long = if (i % 13 == 0) null else (i % 3).toLong
      val v: java.lang.Double =
        if (i == 77) Double.NaN
        else if (i % 7 == 0) null
        else (rnd.nextInt(5) * 10).toDouble
      val c: java.lang.Long =
        if (i % 5 == 0) null else (rnd.nextInt(100) - 50).toLong
      (i.toLong, k1, k2, v, c)
    }
    val df = rows.toDF("id", "k1", "k2", "v", "c")
    val keys = Seq(col("k1"), col("k2"))
    val order = Seq(col("v"), col("id"))
    val gotR = Ranking.withPartitionedRowNumber(df, keys, order, "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("k1", "k2").orderBy(col("v"), col("id"))
    val naiveR = df.withColumn("rn", row_number().over(w).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(gotR == naiveR)
    val gotS = Ranking.withPartitionedRunningSums(df, keys, order,
        Seq((col("c"), "cs")))
      .select("id", "cs").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val naiveS = df.withColumn("cs", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cs").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotS == naiveS)
  }

  test("wide-span keys fall back to the head-only proxy — parity holds " +
    "(balance degrades, never a rank)") {
    // span(k1) = 2^53+1 > 2^52: the packed double could collapse
    // adjacent blocks, so the runtime guard routes every row to the
    // bare-head fallback — results must still equal the naive window
    val rows = (0 until 200).map { i =>
      val k1 = if (i % 2 == 0) 0L else (1L << 53)
      (i.toLong, k1, (i % 5).toLong)
    }
    val df = rows.toDF("id", "k1", "k2")
    val got = Ranking.withPartitionedRowNumber(df,
        Seq(col("k1"), col("k2")), Seq(col("id")), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("rn", row_number().over(
        Window.partitionBy("k1", "k2").orderBy("id")).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got == naive)
  }

  test("high-magnitude small-span keys pack exactly (long subtract " +
    "before cast): parity past 2^53") {
    // snowflake-ID shape: both keys sit near 2^62 with spans ≤ 8, so
    // the span product passes the 2^52 gate — but cast-to-double FIRST
    // collapses all the distinct values onto one double (granularity at
    // 2^62 is 2^10) and the order fraction then interleaves keys across
    // range splits, corrupting ranks (the r12 ADVICE finding). The
    // packing must subtract the min in LONG space, which is exact at
    // any magnitude once the span gate holds.
    val base = 1L << 62
    val rows = (0 until 400).map { i =>
      val k1: java.lang.Long =
        if (i % 11 == 0) null else java.lang.Long.valueOf(base + i % 5)
      val k2: java.lang.Long =
        if (i % 13 == 0) null else java.lang.Long.valueOf(-base - i % 3)
      (i.toLong, k1, k2, (i % 7).toLong)
    }
    val df = rows.toDF("id", "k1", "k2", "c")
    val keys = Seq(col("k1"), col("k2"))
    val got = Ranking.withPartitionedRowNumber(df, keys, Seq(col("id")),
        "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy("k1", "k2").orderBy("id")
    val naive = df.withColumn("rn", row_number().over(w).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got == naive)
    val gotS = Ranking.withPartitionedRunningSums(df, keys,
        Seq(col("id")), Seq((col("c"), "cs")))
      .select("id", "cs").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val naiveS = df.withColumn("cs", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cs").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(gotS == naiveS)
  }

  test("packed composite default: property parity with the naive window " +
    "over random key distributions") {
    // the r12 packing is balance-only BY PROOF; this pins it BY SEARCH:
    // random NDVs (incl. 1 — an all-ties key), random null rates on both
    // keys and the value, random key OFFSETS (so slots exercise non-zero
    // mins and negative keys), rank + running sum vs the naive window
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowsGen = for {
      n <- Gen.chooseNum(1, 160)
      // offsets include snowflake magnitude (±2^62): the long-subtract
      // packing is exact there; cast-first would collapse the slots
      off1 <- Gen.oneOf(Gen.chooseNum(-1000L, 1000L),
        Gen.oneOf(1L << 62, -(1L << 62), (1L << 53) + 7L))
      ndv1 <- Gen.chooseNum(1, 6)
      ndv2 <- Gen.chooseNum(1, 8)
      k1s <- Gen.listOfN(n, Gen.option(Gen.chooseNum(0L, ndv1 - 1L)))
      k2s <- Gen.listOfN(n, Gen.option(Gen.chooseNum(0L, ndv2 - 1L)))
      vs <- Gen.listOfN(n, Gen.option(Gen.chooseNum(-40L, 40L)))
    } yield (0 until n).map { i =>
      (i.toLong,
        k1s(i).map(v => java.lang.Long.valueOf(v + off1)).orNull,
        k2s(i).map(java.lang.Long.valueOf(_)).orNull,
        vs(i).map(java.lang.Long.valueOf(_)).orNull)
    }
    val prop = Prop.forAllNoShrink(rowsGen) { rows =>
      val df = rows.toDF("id", "k1", "k2", "v")
      val keys = Seq(col("k1"), col("k2"))
      val got = Ranking.withPartitionedPrefix(df, keys, Seq(col("id")),
          Some("rn"), Seq((col("v"), "cs")))
        .select("id", "rn", "cs").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
      val w = Window.partitionBy("k1", "k2").orderBy("id")
      val naive = df
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cs", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "rn", "cs").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
      got == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12)
        .withInitialSeed(org.scalacheck.rng.Seed(23L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("withGlobalPrefix matches naive windows on random tie-heavy data") {
    // the single-pass engine under DistributeGlobalRank: rank, total
    // count, inclusive sum/max and EXCLUSIVE min must all agree with
    // the naive single-task windows on arbitrary data — tie-heavy keys
    // (11 distinct values), null values, negatives, and the empty frame
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.ops.Ranking.{RunMax, RunMin, RunSum, RunningSpec}
    val rowsGen = for {
      n <- Gen.chooseNum(0, 220)
      keys <- Gen.listOfN(n, Gen.chooseNum(-5, 5))
      vals <- Gen.listOfN(n, Gen.option(Gen.chooseNum(-50L, 50L)))
    } yield keys.zip(vals).zipWithIndex.map { case ((k, v), i) =>
      (i.toLong, k, v.map(java.lang.Long.valueOf).orNull)
    }
    val prop = Prop.forAllNoShrink(rowsGen) { rows =>
      val df = rows.toDF("id", "k", "c")
      val specs = Seq(
        RunningSpec(col("c"), RunSum, inclusive = true, "cs"),
        RunningSpec(col("c"), RunMin, inclusive = false, "cm"),
        RunningSpec(col("c"), RunMax, inclusive = true, "cx"))
      val got = Ranking
        .withGlobalPrefix(df, Seq(col("k"), col("id")), Some("rn"),
          Some("n"), specs)
        .select("id", "rn", "n", "cs", "cm", "cx")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      val w = Window.orderBy(col("k"), col("id"))
      val naive = df
        .withColumn("rn", row_number().over(w).cast("long") - 1L)
        .withColumn("n", count(lit(1)).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("cs", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cm", min(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("cx", max(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "rn", "n", "cs", "cm", "cx")
        .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
      got == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25)
        .withInitialSeed(org.scalacheck.rng.Seed(11L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("stringPrefixFraction is monotone non-decreasing in binary string order") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.listOfN(2,
      Gen.chooseNum(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(32.toChar, 1000.toChar)).map(_.mkString)))
    val prop = Prop.forAllNoShrink(gen) { case List(a, b) =>
      val Seq(fa, fb) = Seq(a, b).toDF("s")
        .select(Ranking.stringPrefixFraction(col("s")))
        .as[Double].collect().toSeq
      // consistency with Spark's binary string comparison, allowing
      // ties (prefix collapse) — never an inversion
      if (a < b) fa <= fb else if (b < a) fb <= fa else fa == fb
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("default range proxy: string/ntz/date leading keys split into " +
    "MULTIPLE ranges instead of silently casting to null") {
    // before the r11 fix, a string leading key cast to double = null for
    // every row → one distinct proxy value → ONE range → the single-task
    // sort this module exists to remove, invisibly. The proxy must give
    // distinct keys distinct (or at least plural) values.
    val sdf = Seq("apple", "banana", "cherry", "grape", "melon")
      .toDF("s")
    val sVals = sdf.select(Ranking.defaultRangeProxy(sdf, col("s"))
      .cast("double")).as[Double].collect().toSet
    assert(sVals.size > 1, s"string proxy collapsed: $sVals")
    val ddf = Seq("2024-01-01", "2024-06-01", "2025-01-01")
      .toDF("x").select(col("x").cast("date").as("d"))
    val dVals = ddf.select(Ranking.defaultRangeProxy(ddf, col("d"))
      .cast("double")).as[Double].collect().toSet
    assert(dVals.size == 3, s"date proxy collapsed: $dVals")
    val ntz = Seq("2024-01-01 10:00:00", "2024-01-02 10:00:00")
      .toDF("x").select(col("x").cast("timestamp_ntz").as("t"))
    val nVals = ntz.select(Ranking.defaultRangeProxy(ntz, col("t"))
      .cast("double")).as[Double].collect().toSet
    assert(nVals.size == 2, s"ntz proxy collapsed: $nVals")
  }
}
