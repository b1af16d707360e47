package graft.queries

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The pretraining funnel ([[CurationQueries.pretrainFunnel]]) on a
  * planted corpus — pins the stage semantics the driver fixture cannot
  * exercise (it contains no normalized-exact duplicates) and the
  * computed-over-survivors contract of the near-dup stage:
  *
  *  - stage 1 drops each quality-reject class (short / low-TTR /
  *    no-stopwords) and nothing else;
  *  - stage 2 drops the case-variant exact twin and keeps the MINIMUM
  *    doc_id (normalization is part of the fingerprint);
  *  - stage 3 drops exactly the verified near-dup's non-canonical member;
  *  - a doc whose ONLY near-dup partner was already quality-rejected is
  *    NOT dropped — clusters are computed over stage-2 survivors, pinned
  *    by the contrast run where the partner is padded to pass quality and
  *    the same doc then IS dropped;
  *  - stage 4 drops the contaminated doc AND the benchmark's own docs;
  *  - stage 5 applies the per-SOURCE mix budgets to the POST-DEDUP
  *    survivors (the base corpus rides a keep-all domain so the earlier
  *    pins stay sharp; the dedicated budget test plants a 20%-budget
  *    domain with externally-computed md5 buckets, including a doc
  *    whose exact twin was deduped first — membership pinned to the
  *    row by distinct token counts);
  *  - chunk/shard rows follow the MIXED survivors' token arithmetic.
  */
class PretrainPipelineSpec extends AnyFunSuite {

  // 24 words, distinct-heavy, stopword-bearing: passes every quality rule
  private def sentence(prefix: String): String =
    (1 to 20).map(i => s"$prefix$i").mkString(" ") + " the and of it"

  private val goodA = sentence("alpha")
  private val goodB = sentence("beta")
  private val goodC = sentence("gamma")
  private val bench = sentence("delta")

  private def funnel(rows: Seq[(Long, String, String, String)]): Map[String, (Long, Long)] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs: DataFrame = rows.toDF("doc_id", "lang", "source", "text")
    CurationQueries.pretrainFunnel(docs).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
  }

  private def tokens(s: String): Long = s.split(" ").length.toLong

  // the base corpus; doc 11 (19 tokens, quality-rejected) is goodC's only
  // near-dup partner
  private val base: Seq[(Long, String, String, String)] = Seq(
    (1L, "en", "src3", goodA),
    (2L, "en", "src3", goodA.replace("alpha7", "ALPHA7")), // exact twin mod case
    (3L, "en", "src3", goodB),
    (4L, "en", "src3", goodB.replace("it", "at")), // near-dup: last token edited
    (5L, "en", "src3", "too short and thin"), // quality: too_short
    (6L, "en", "src3", Seq.fill(25)("spam").mkString(" ")), // quality: low TTR
    (7L, "en", "src3", (1 to 24).map(i => s"rare$i").mkString(" ")), // no stopwords
    (8L, "en", "src0", bench), // the benchmark doc itself
    // contaminated: 12/20 of its trigrams come from bench (prefix + the
    // shared stopword tail), yet trigram-Jaccard vs doc 8 is 12/30 < 0.5
    // so stage 3 can NOT claim it - only decontamination catches it
    (9L, "en", "src3",
      bench.split(" ").take(12).mkString(" ") + " the and of it " +
        (1 to 6).map(i => s"novel$i").mkString(" ")),
    (10L, "en", "src3", goodC),
    (11L, "en", "src3", goodC.split(" ").take(19).mkString(" "))) // rejected partner

  test("every stage drops exactly its planted docs") {
    val f = funnel(base)
    assert(f("raw")._1 === 11L)
    assert(f("raw")._2 === base.map(r => tokens(r._4)).sum)
    // quality keeps 1,2,3,4,8,9,10 (drops 5,6,7,11)
    assert(f("quality")._1 === 7L)
    // exact dedup drops the case twin (doc 2), keeping min id 1
    assert(f("exact_dedup")._1 === 6L)
    assert(f("exact_dedup")._2 === f("quality")._2 - tokens(goodA))
    // near dedup drops doc 4 ONLY: doc 10's partner (11) never reached it
    assert(f("near_dedup")._1 === 5L)
    // decontamination drops doc 9 (contaminated) and doc 8 (benchmark)
    assert(f("decontaminated")._1 === 3L)
    val survivorTokens = tokens(goodA) + tokens(goodB) + tokens(goodC)
    assert(f("decontaminated")._2 === survivorTokens)
    // src3 → suffix 3 mod 3 = 0 → 10000 bps: the mix stage keeps ALL
    assert(f("mixed") === f("decontaminated"))
    // all survivors are < ChunkSize tokens: one chunk each, full coverage
    assert(f("chunks")._1 === 3L)
    assert(f("chunks")._2 === survivorTokens)
    // one lang, well under the 1500-token budget: a single shard
    assert(f("shards")._1 === 1L)
    assert(f("shards")._2 === survivorTokens)
  }

  test("near-dup clusters form over survivors: a padded partner flips the drop") {
    // pad doc 11 back over every quality bar; it is goodC minus 5 trailing
    // tokens plus the pad, still >= 0.5 trigram-Jaccard with doc 10 - now
    // it reaches stage 3 and its cluster keeps ONLY min(10, 11) = 10
    val padded = base.map {
      case (11L, l, s, t) => (11L, l, s, t + " the and of it padone")
      case r => r
    }
    val f = funnel(padded)
    assert(f("quality")._1 === 8L)
    // doc 11 is a one-sided truncation of doc 10, not a normalized twin
    assert(f("exact_dedup")._1 === 7L)
    // stage 3 now drops BOTH doc 4 and doc 11
    assert(f("near_dedup")._1 === 5L)
    assert(f("decontaminated")._1 === 3L)
  }

  test("mix budgets are honored over the POST-dedup survivors, " +
    "per domain, by the pinned md5 buckets") {
    // src2 → suffix 2 mod 3 = 2 → 2000 bps (20% budget); src3 → keep-all.
    // md5 buckets (computed externally, not via the op under test):
    //   20→5096  21→1988  22→130  23→3772  24→4823
    // so of the post-dedup src2 survivors {20,21,22,23} the budget keeps
    // exactly {21, 22}. Doc 24 is an exact case-twin of doc 21: it dies
    // at exact-dedup BEFORE the budget — its bucket (4823, a discard)
    // never gets to veto doc 21's slot, which is precisely the
    // budget-after-dedup contract. Distinct token counts per doc make
    // the mixed tokens sum identify the kept SET, not just its size.
    val w20 = sentence("u")                      // 24 tokens
    val w21 = sentence("v") + " extraone"        // 25
    val w22 = sentence("w") + " extraone extratwo" // 26
    val w23 = sentence("x") + " extraone extratwo extrathree" // 27
    val rows: Seq[(Long, String, String, String)] = Seq(
      (1L, "en", "src3", goodA),
      (3L, "en", "src3", goodB),
      (8L, "en", "src0", bench),
      (20L, "en", "src2", w20),
      (21L, "en", "src2", w21),
      (22L, "en", "src2", w22),
      (23L, "en", "src2", w23),
      (24L, "en", "src2", w21.replace("v7", "V7"))) // exact twin of 21
    val f = funnel(rows)
    assert(f("quality")._1 === 8L)
    assert(f("exact_dedup")._1 === 7L) // doc 24 folds into 21
    assert(f("near_dedup")._1 === 7L)
    assert(f("decontaminated")._1 === 6L) // bench doc 8 drops
    assert(f("mixed")._1 === 4L) // src3: 1,3; src2 budget: 21,22
    assert(f("mixed")._2 ===
      tokens(goodA) + tokens(goodB) + tokens(w21) + tokens(w22))
    // chunks/shards read the MIXED survivors
    assert(f("chunks")._2 === f("mixed")._2)
    assert(f("shards")._2 === f("mixed")._2)
  }
}
