package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Randomized parity for the pointer-jumping connected components: the
  * oracle certifies `dedup_clusters` on the documents corpus; this pits
  * [[TextDedup.duplicateClusters]] against an independent union-find
  * over adversarial random topologies — sparse forests (many small
  * components), dense blobs (heavy label contention), and a pure chain
  * (the worst case for min-label propagation, where convergence needs
  * the doubling behavior pointer jumping exists for).
  */
class ClusterPropertySpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  /** Reference partition via union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    parent.keys.toSeq.groupBy(find).map { case (_, ks) =>
      ks.min -> ks.toSet
    }
  }

  private def sparkPartition(edges: Seq[(Long, Long)])
  : Map[Long, Set[Long]] = {
    val out = TextDedup.duplicateClusters(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect()
    out.groupBy(_._2).map { case (_, rows) =>
      val docs = rows.map(_._1).toSet
      docs.min -> docs
    }
  }

  test("random sparse and dense graphs match union-find partitions") {
    val rnd = new scala.util.Random(0x9e3779b9L)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 10
      val m = if (trial % 2 == 0) n * 3 else n / 2 // dense vs forest
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val expected = unionFind(edges.flatMap(e => Seq(e, e.swap)))
        assert(sparkPartition(edges) == expected,
          s"trial $trial (n=$n m=$m) diverged from union-find")
      }
    }
  }

  test("a pure 40-node chain converges to one component") {
    // min-label must travel 39 hops; naive one-hop propagation needs 39
    // rounds and trips the 20-iteration guard — pointer jumping's
    // label-doubling gets there in O(log n)
    val edges = (0L until 39L).map(i => (i, i + 1))
    val got = sparkPartition(edges)
    assert(got == Map(0L -> (0L to 39L).toSet))
  }
}
