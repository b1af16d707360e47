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
}
