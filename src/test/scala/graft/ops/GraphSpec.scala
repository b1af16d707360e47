package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def sym(pairs: (String, String)*) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  test("pagerank: symmetric triangle stays uniform at every iteration") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"))
    for (iters <- Seq(0, 1, 4)) {
      val out = Graph.pageRank(edges, iters).as[(String, Double)]
        .collect().toMap
      assert(out.keySet == Set("a", "b", "c"))
      out.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12))
    }
  }

  test("pagerank: path graph a-b-c, one damped iteration, by hand") {
    val out = Graph.pageRank(sym(("a", "b"), ("b", "c")), 1)
      .as[(String, Double)].collect().toMap
    // a gets 0.15/3 + 0.85 * (rank(b)/outdeg(b)) = 0.05 + 0.85/6
    val end = 0.05 + 0.85 * (1.0 / 3 / 2)
    val mid = 0.05 + 0.85 * (2.0 / 3)
    assert(math.abs(out("a") - end) < 1e-12)
    assert(math.abs(out("c") - end) < 1e-12)
    assert(math.abs(out("b") - mid) < 1e-12)
    assert(math.abs(out.values.sum - 1.0) < 1e-12)
  }

  test("pagerank: mass conserved on a sink-free graph, hubs rank higher") {
    // star: hub h connected to 5 leaves (symmetric)
    val edges = sym((1 to 5).map(i => ("h", s"l$i")): _*)
    val out = Graph.pageRank(edges, 3).as[(String, Double)].collect().toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    assert((1 to 5).forall(i => out("h") > out(s"l$i")))
  }

  test("triangles: K4 gives every node 3 triangles; pendant edge none") {
    // complete graph on 1..4 (4 triangles, each node in 3) plus a
    // pendant 4-5 edge, fed with duplicates and both orientations
    val k4 = for {
      a <- 1 to 4; b <- 1 to 4 if a != b
    } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 4L), (4L, 5L)))
      .toDF("src", "dst")
    val out = Graph.triangles(edges).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: two triangles sharing an edge count the shared pair twice") {
    // a-b-c and b-c-d share edge b-c: a,d in 1 triangle; b,c in 2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.triangles(edges).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("labelPropagation: triangle converges to the min label") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val out = Graph.labelPropagation(sym, 2).as[(Long, Long)]
      .collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: path graph, one sync round, by hand") {
    // 1-2-3: node 1 adopts 2; node 2 ties {1,3} -> min 1; node 3 adopts 2
    val edges = Seq((1L, 2L), (2L, 3L))
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val out = Graph.labelPropagation(sym, 1).as[(Long, Long)]
      .collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("labelPropagation: directed input keeps labels of no-in-edge nodes") {
    // deliberately NOT symmetrized: node 1 has out-edges only
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, 2).as[(Long, Long)]
      .collect().toMap
    // 2 and 3 adopt 1's label; 1 keeps its own instead of vanishing
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // r17: the loops' per-iteration join-strategy decision. A checkpointed
  // |V| frame carries the default (huge) size estimate, so the decision
  // must come from a real row count against the engine's own threshold —
  // and must flip OFF for big frames and when the conf disables
  // broadcasting (including the "-1" spelling, which does not parse as a
  // byte string).
  test("broadcastIfSmall: row-count-driven, honors the engine threshold") {
    val df = spark.range(10).toDF("node")
    // under the bar: a new, hint-carrying frame
    val small = Graph.broadcastIfSmall(df, 10L)
    assert(small ne df)
    assert(small.queryExecution.analyzed.toString.contains("Hint") ||
      small.queryExecution.optimizedPlan.toString.contains("Hint"))
    // over the bar (10M rows x 64B >> 10MB): the frame passes through
    assert(Graph.broadcastIfSmall(df, 10000000L) eq df)
    // threshold "-1" = auto-broadcast off: never hint, never throw
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      assert(Graph.broadcastIfSmall(df, 10L) eq df)
    } finally spark.conf.set(key, old)
  }
}
