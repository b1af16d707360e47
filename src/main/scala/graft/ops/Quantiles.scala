package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentiles at data scale, without the exact-`percentile` buffer.
  *
  * Spark's exact `percentile` is a `TypedImperativeAggregate` whose buffer
  * is a value→count map of the ENTIRE column per group — on a single-group
  * (global) percentile that is the whole column's distinct values in one
  * reducer's heap, the canonical 100 TB OOM. This op computes the SAME
  * interpolated (type-7, `quantile_cont`) result with bounded state
  * everywhere, by bracket-and-refine:
  *
  *  1. ONE pass: per-group `count` + `percentile_approx` at q±3ε
  *     (ε = 1/accuracy). Greenwald–Khanna gives a DETERMINISTIC rank
  *     guarantee — the bracket [lo, hi] provably contains the exact target
  *     ranks once ε·n ≥ 2 — and its summary is O(accuracy·log n), never
  *     O(n).
  *  2. ONE counting pass calibrates the bracket: ranks below/at each bound
  *     and the bound's tie mass. If n is too small for the ε-guarantee to
  *     bite (n ≲ 2·accuracy — the regime where a whole-group sort is
  *     trivial anyway), coverage flags relax the bracket to the full group.
  *  3. The STRICT interior (lo, hi) — at most ~8ε·n rows per quantile
  *     regardless of ties, because boundary tie mass stays outside — is
  *     ranked with a per-(group, quantile) `row_number` and the two target
  *     ranks are picked. Targets landing on a boundary value's tie range
  *     are resolved arithmetically from the calibration counts, so a
  *     million-row tie never enters the sort.
  *
  * Cost: 3 scans of the input instead of 1 (exactness at scale costs
  * passes); every shuffle is a keyed hash aggregate; the only sort is over
  * the O(n/accuracy) interior slice. Raising `accuracy` shrinks the slice
  * linearly while growing the (tiny) sketch summary.
  *
  * Scan sharing: by default the projected (group, value) frame is lazily
  * `localCheckpoint`ed, so the three passes read ONE materialized compact
  * copy instead of re-evaluating the input lineage three times — the
  * checkpoint happens at first action (construction stays lazy, no job
  * fires when the query function is built). At cluster scale this trades
  * recompute for executor-local MEMORY_AND_DISK storage of a few-column
  * slice — the standard "cache the projection" move for multi-pass
  * algorithms. Callers that already materialized a shared frame (e.g. a
  * median→MAD chain where the SAME source feeds two `exact` calls plus a
  * final aggregate) should checkpoint that frame once themselves and pass
  * `materialize = false` to avoid a second copy.
  *
  * Interpolation replicates Spark's `Percentile.getPercentile` exactly —
  * `pos = q·(n−1)`, result = `v_lo·(⌈pos⌉−pos) + v_hi·(pos−⌊pos⌋)` (the
  * element itself when pos is integral) — so results are bit-identical to
  * the built-in exact aggregate (pinned by QuantilesSpec).
  */
object Quantiles {

  /** One quantile request: output column name, value expression, fraction
    * in [0, 1].
    */
  final case class Q(name: String, value: Column, q: Double)

  /** Exact interpolated quantiles of `specs` over `df`, one output row per
    * group (one row total when `groupCols` is empty), one output column per
    * spec name. Nulls in a value column are ignored, like the built-in.
    */
  def exact(df: DataFrame, specs: Seq[Q], groupCols: Seq[String] = Nil,
            accuracy: Int = 10000, materialize: Boolean = true): DataFrame = {
    require(specs.nonEmpty, "at least one quantile spec")
    require(specs.forall(s => s.q >= 0.0 && s.q <= 1.0), "q in [0,1]")
    val eps = 3.0 / accuracy
    val gcols = groupCols.map(col)
    // Deduplicate semantically-identical value expressions: p10/p50/p90/p99
    // of ONE measure is the common request, and sketching the same column
    // once per fraction would cost 4 GK summaries (and 4 materialized
    // copies) where one suffices — each distinct expression gets one
    // projected column and one sketch queried at every bracket fraction.
    val castCols = specs.map(_.value.cast("double"))
    val colIdx = new Array[Int](specs.length)
    val distinctCols = scala.collection.mutable.ArrayBuffer[Column]()
    specs.indices.foreach { i =>
      val j = distinctCols.indexWhere(_ == castCols(i))
      if (j >= 0) colIdx(i) = j
      else { colIdx(i) = distinctCols.length; distinctCols += castCols(i) }
    }
    def v(i: Int): Column = col(s"__c${colIdx(i)}")
    val projected = df.select(
      gcols ++ distinctCols.toSeq.zipWithIndex.map { case (c, k) =>
        c.as(s"__c$k")
      }: _*)
    // lazy checkpoint: the 3 passes share one materialization of the
    // narrow projection; eager=false keeps query construction job-free
    val base = if (materialize) projected.localCheckpoint(false) else projected

    def gb(d: DataFrame) =
      if (groupCols.isEmpty) d.groupBy() else d.groupBy(gcols: _*)
    // the per-group scalar frames are broadcast back onto the data; with
    // group keys the join is an equi-join Spark auto-broadcasts (the
    // scalar side is one row per group)
    def attach(d: DataFrame, scalars: DataFrame) =
      if (groupCols.isEmpty) d.crossJoin(broadcast(scalars))
      else d.join(broadcast(scalars), groupCols)

    // ---- stage 1: count + sketch bracket, one hash-aggregate pass (ONE
    // GK summary per distinct column, queried at every spec's q±ε via an
    // array-percentile)
    val byCol = specs.indices.groupBy(colIdx).toSeq.sortBy(_._1)
    val s1aggs = byCol.flatMap { case (k, sis) =>
      val c = col(s"__c$k")
      val fracs = sis.flatMap { i =>
        val q = specs(i).q
        Seq(math.max(0.0, q - eps), math.min(1.0, q + eps))
      }
      Seq(
        count(c).as(s"__cn$k"),
        percentile_approx(c, typedLit(fracs), lit(accuracy)).as(s"__cb$k"))
    }
    val s1 = gb(base).agg(s1aggs.head, s1aggs.tail: _*)
      .select(gcols ++ byCol.flatMap { case (k, sis) =>
        sis.zipWithIndex.flatMap { case (i, pos) =>
          Seq(col(s"__cn$k").as(s"__n$i"),
            element_at(col(s"__cb$k"), pos * 2 + 1).as(s"__lo$i"),
            element_at(col(s"__cb$k"), pos * 2 + 2).as(s"__hi$i"))
        }
      }: _*)

    // ---- stage 2: bracket calibration — ranks and tie masses at the
    // bounds, one counting pass
    val s2aggs = specs.indices.flatMap { i =>
      val vi = v(i)
      Seq(
        sum(when(vi < col(s"__lo$i"), 1L).otherwise(0L)).as(s"__cl$i"),
        sum(when(vi <= col(s"__hi$i"), 1L).otherwise(0L)).as(s"__ch$i"),
        sum(when(vi === col(s"__lo$i"), 1L).otherwise(0L)).as(s"__eql$i"),
        sum(when(vi === col(s"__hi$i"), 1L).otherwise(0L)).as(s"__eqh$i"),
        first(col(s"__n$i")).as(s"__n$i"),
        first(col(s"__lo$i")).as(s"__lo$i"),
        first(col(s"__hi$i")).as(s"__hi$i"))
    }
    val s2 = gb(attach(base, s1)).agg(s2aggs.head, s2aggs.tail: _*)

    // per-spec derived scalars (all computed from s2 columns)
    def pos(i: Int) = (col(s"__n$i").cast("double") - 1.0) * lit(specs(i).q)
    def k1(i: Int) = (floor(pos(i)) + 1.0).cast("long") // lower target rank
    def k2(i: Int) = (ceil(pos(i)) + 1.0).cast("long")  // upper target rank
    // bracket provably contains both target ranks? (always true once
    // ε·n ≥ 2; the flags make small n exact too, via a full-group slice)
    def covLo(i: Int) =
      coalesce(col(s"__lo$i").isNotNull && col(s"__cl$i") < k1(i), lit(false))
    def covHi(i: Int) =
      coalesce(col(s"__hi$i").isNotNull && col(s"__ch$i") >= k2(i), lit(false))
    def clEff(i: Int) = when(covLo(i), col(s"__cl$i")).otherwise(0L)
    def eqlEff(i: Int) = when(covLo(i), col(s"__eql$i")).otherwise(0L)

    // ---- stage 3: rank the strict interior of each bracket. The
    // interior target ranks ride INSIDE the exploded struct (computed
    // from the already-joined s2 scalars) so the slice rows never join
    // the calibration frame a second time — keeps the logical plan one
    // s2 subtree smaller and avoids an m-way CASE dispatch per row.
    val tagged = attach(base, s2).select(
      gcols ++ Seq(
        explode(array(specs.indices.map { i =>
          val vi = v(i)
          val inBracket =
            (!covLo(i) || vi > col(s"__lo$i")) &&
              (!covHi(i) || vi < col(s"__hi$i"))
          when(vi.isNotNull && inBracket,
            struct(lit(i).as("qi"), vi.as("v"),
              (k1(i) - clEff(i) - eqlEff(i)).as("t1"),
              (k2(i) - clEff(i) - eqlEff(i)).as("t2")))
        }: _*)).as("__m")): _*)
      .filter(col("__m").isNotNull)
      .select(gcols ++ Seq(col("__m.qi").as("__qi"), col("__m.v").as("__v"),
        col("__m.t1").as("__t1"), col("__m.t2").as("__t2")): _*)
    val w = Window.partitionBy(gcols :+ col("__qi"): _*).orderBy(col("__v"))
    val innerAggs = specs.indices.flatMap { i =>
      Seq(
        max(when(col("__qi") === i && col("__r") === col("__t1"), col("__v")))
          .as(s"__iv1$i"),
        max(when(col("__qi") === i && col("__r") === col("__t2"), col("__v")))
          .as(s"__iv2$i"))
    }
    val inner = gb(
      tagged
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") === col("__t1") || col("__r") === col("__t2")))
      .agg(innerAggs.head, innerAggs.tail: _*)

    // ---- resolve: boundary tie ranges arithmetically, interior from the
    // ranked slice, then Spark's exact interpolation formula
    val joined =
      if (groupCols.isEmpty) s2.crossJoin(inner)
      else s2.join(inner, groupCols, "left")
    val results = specs.zipWithIndex.map { case (s, i) =>
      def elem(k: Column, innerV: Column): Column =
        when(covLo(i) && k <= col(s"__cl$i") + col(s"__eql$i"), col(s"__lo$i"))
          .when(covHi(i) && k > col(s"__ch$i") - col(s"__eqh$i"), col(s"__hi$i"))
          .otherwise(innerV)
      val p = pos(i)
      val v1 = elem(k1(i), col(s"__iv1$i"))
      val v2 = elem(k2(i), col(s"__iv2$i"))
      when(col(s"__n$i") === 0, lit(null).cast("double"))
        .when(floor(p) === ceil(p), v1)
        .otherwise(v1 * (ceil(p) - p) + v2 * (p - floor(p)))
        .as(s.name)
    }
    joined.select(gcols ++ results: _*)
  }
}
