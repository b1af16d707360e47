package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger

/** Repo-wide lazy-construction contract: calling a `SparkEntry.queries`
  * function BUILDS a plan — it must not run a Spark job. An eager action at
  * construction (a driver `count()`, an eager `localCheckpoint`) is an
  * extra full pass per invocation at 100 TB, fired before the caller even
  * decides what to do with the frame. Round 7 flagged three such counts in
  * the tf-idf family; this spec pins the fix and protects every other
  * query from regressing the same way.
  *
  * Exceptions are enumerated, not discovered: ops whose CONSTRUCTION is an
  * iterative driver loop with a convergence probe (pointer-jumping
  * connected components short-circuits on `isEmpty`), and the
  * reference-parity scorer whose ≤8-row collect mirrors the reference's
  * in-driver dict (reference etl/orders_etl.py:112-115).
  */
class LazyConstructionSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  /** Construction may legitimately run jobs for these keys (reason above). */
  private val eagerByDesign = Set(
    "dedup_clusters", // convergence-probed pointer jumping
    "dedup_keep_best", // builds on dedup_clusters
    "dedup_pipeline", // composes the cluster pass
    "pretrain_pipeline", // stage survivor sets checkpointed + CC stage
    "entity_resolve", // clustering stage is dedup_clusters
    "similarity_scores", // reference-parity ≤8-row driver dict
    "bucketed_join", // writes the bucketed tables it demonstrates
    "ann_ivf_pruned", // writes the centroid-partitioned IVF index (memoized)
    "jsonl_roundtrip", // writes the JSONL files it quarantine-reads
    "orc_roundtrip", // writes the ORC files it reads back
    "cbo_join_reorder", // ANALYZE scans + the CBO-scoped bounded collect
    "window_partitioned_auto", // ANALYZE scans (memoized) + the CBO-scoped
                               // optimization forced at construction; the
                               // RESULT is lazy (r12: collect removed)
    "window_partitioned_range_auto", // same contract, RANGE-frame leg
    "window_partitioned_string_auto", // same contract, dense-key-index leg
    // Multi-pass intermediates pinned with localCheckpoint(eager=false):
    // no DRIVER action fires, but AQE materializes the checkpoint's
    // exchange stages when the RDD is resolved at construction. The
    // alternative (no checkpoint) was measured slower for these shapes —
    // iterative loops need lineage truncation, and the checkpointed
    // frames feed 3+ consumers at different keys.
    "pagerank", "lpa_communities", "graph_triangles", "graph_khop",
    "funnel_latency", "rfm_segments",
    "outlier_mad", // r8: med/bounds scalar frames checkpointed (3.1s→1.85s)
    "bpe_train", // r8: per-round vocab stages checkpointed — un-checkpointed,
                 // the union of R rules is O(R²) corpus scans and the nested
                 // folds OOM'd codegen (measured: heap exhaustion at R=10)
    "bpe_tokenize", // r8: same checkpointed round chain, plus the all-words
                    // table it folds the learned rules over
    "split_leakage", // r14: the (doc, split, fingerprint) frame feeds three
                     // consumers; un-checkpointed the shingle explode ran
                     // SIX times (no ReuseExchange across the aggregate
                     // shapes)
    "split_rebalance", // r15: embeds the convergence-probed pointer-jumping
                       // CC pass (same reason as dedup_clusters)
    "cjk_unsegmented", // r15: the synthesized-corpus and char-shingle
                      // frames each feed two consumers and are pinned
                      // with localCheckpoint(eager=false) — no driver
                      // action, but AQE resolves the checkpoint's
                      // exchange at construction (same as split_leakage)
    // r17 optimization round: shared multi-consumer frames pinned with
    // localCheckpoint(eager=false) — same contract as the block above
    // (no driver action; AQE materializes the pinned subtree's exchange
    // stages at construction). Each pin removed a measured per-consumer
    // re-execution of the subtree (scan counts in OPTIMIZATION_r17.md §3);
    // the six former cache() sites in VectorQueries are additionally a
    // measurement-honesty fix — CacheManager re-served them across bench
    // passes (r16 ADVICE).
    "ann_ivf", "ann_ivf_k64", "ann_ivf_nprobe2", "ann_ivfpq", "ann_recall",
    "decontaminate_semantic", "dedup_incremental", "dedup_ngram_jaccard",
    "dedup_substring", "dedup_substring_clean", "embedding_outliers",
    "keywords_topk", "kmeans_refine", "sample_cluster_balanced",
    "semantic_dedup", "semantic_dedup_k64", "tf_idf", "tfidf_cosine_pairs",
    "vocab_build"
  )

  test("query construction runs zero Spark jobs (outside the eager allowlist)") {
    val spark = TestSpark.spark
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // settle: let any event from previous suites drain before counting
      def settled(): Int = {
        var last = jobs.get(); var stableMs = 0
        while (stableMs < 120) {
          Thread.sleep(30)
          val now = jobs.get()
          if (now == last) stableMs += 30 else { last = now; stableMs = 0 }
        }
        last
      }
      // warm pass: first touch of each parquet path legitimately runs the
      // listing/footer job Spark fires inside `spark.read.parquet`; the
      // memoized Readers.table makes every LATER construction job-free,
      // which is what the measured pass asserts
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, sfDir) catch { case _: Throwable => () }
      }
      settled()
      val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          if (eagerByDesign(name)) { fn(spark, sfDir); settled(); None }
          else {
            val before = jobs.get()
            fn(spark, sfDir) // construction only — no action
            val after = settled()
            if (after != before) Some(s"$name fired ${after - before} job(s)")
            else None
          }
      }
      assert(violations.isEmpty,
        s"queries ran jobs at construction:\n  ${violations.mkString("\n  ")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
