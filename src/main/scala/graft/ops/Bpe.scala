package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge-rule training — the
  * tokenizer-learning step of an LLM data pipeline, as ONE lazy Spark
  * plan: no driver loop, no collect.
  *
  * Round structure (classic Sennrich/GPT BPE over a word-frequency
  * table):
  *   1. count adjacent symbol pairs, weighted by word frequency
  *      (adjacent-position counting, overlaps included — the standard);
  *   2. the argmax pair (ties broken lexicographically, so every engine
  *      agrees) becomes merge rule r;
  *   3. apply the merge to every word — LEFTMOST-NON-OVERLAPPING, via an
  *      `aggregate` fold over the symbol array (the fold appends, or
  *      replaces its last element when (last, next) equals the rule —
  *      exactly the sequential semantics, in a parallel map).
  *
  * The trick that keeps it lazy: each round's rule is a ONE-ROW frame
  * (`orderBy.limit(1)`) cross-joined (broadcast) into the next round's
  * fold, which references its columns instead of driver-collected
  * literals. R rounds = R nested folds in one DAG; Catalyst plans the
  * whole chain, and nothing executes until the sink asks.
  *
  * Scale: the corpus reduces ONCE to a word-frequency table (the only
  * data-sized pass); every round then runs over vocab-sized data. At
  * 100 TB the vocab table is millions of rows — each round is a
  * hash-aggregate + a 1-row TakeOrdered over it, embarrassingly small
  * next to the corpus scan that produced it.
  */
object Bpe {

  /** Word-frequency base table: lowercase whitespace tokens restricted to
    * `^[a-z]+$` (BPE is defined over a closed symbol alphabet; the
    * separator char used by the oracle replay must not occur in a
    * symbol), capped at the `maxWords` most frequent words
    * (deterministic: count desc, word) so the oracle replay stays
    * affordable.
    */
  def wordTable(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    wordCounts(docs, textCol)
      .orderBy(col("c").desc, col("w")).limit(maxWords)

  /** The one word-normalization contract (explode → lower → alphabet
    * filter → count) — every consumer and both DuckDB oracles must agree
    * on it, so it lives in exactly one place.
    */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("t"))
      .select(lower(col("t")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Split words into character symbols; Spark's split keeps the
    * trailing zero-width match as an empty string — drop it.
    */
  private def withSyms(df: DataFrame): DataFrame =
    df.select(col("w"), col("c"),
      filter(split(col("w"), "(?!^)"), x => length(x) > 0).as("syms"))

  /** One merge round over (w, c, syms): returns (rule, merged) where
    * `rule` is the 1-row argmax frame (a, b, pair_count) and `merged` the
    * vocabulary with the rule applied.
    */
  private def round(vocab: DataFrame): (DataFrame, DataFrame) = {
    val pairs = vocab
      .select(col("c"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("c")).as("pair_count"))
    // the sentinel no-op rule (a = b = '' — the empty string is never a
    // symbol) guarantees the rule frame is EXACTLY one row even when the
    // vocabulary has no pairs left: an empty argmax would otherwise
    // crossJoin-annihilate the whole word table, silently losing every
    // tokenization. An exhausted round emits the explicit no-op instead.
    val sentinel = vocab.sparkSession.range(1)
      .select(lit("").as("a"), lit("").as("b"), lit(0L).as("pair_count"))
    val rule = pairs.orderBy(col("pair_count").desc, col("a"), col("b"))
      .limit(1)
      .unionAll(sentinel)
      .orderBy(col("pair_count").desc, col("a"), col("b")).limit(1)
    (rule, applyRule(vocab, rule))
  }

  /** Apply `rounds` learned merge rules to EVERY distinct word (not just
    * the capped training vocabulary) and return (w, n_tokens) — the
    * tokenizer's inference path. Same lazy shape as training: each rule
    * is a 1-row broadcast crossJoin feeding the next fold; the word list
    * is distinct-word-sized, so a corpus tokenizes by a broadcast join
    * against this table instead of folding per occurrence.
    */
  def tokenizeWords(docs: DataFrame, textCol: String, rounds: Int,
                    maxWords: Int): DataFrame = {
    // ONE data-sized pass: the word-count table feeds BOTH the capped
    // training vocabulary and the full word list (a second corpus
    // explode for the distinct words would double the only cost that
    // scales with the data)
    val counts = wordCounts(docs, textCol).localCheckpoint(false)
    var vocab = withSyms(counts.orderBy(col("c").desc, col("w"))
      .limit(maxWords)).localCheckpoint(false)
    var all = withSyms(counts.select(col("w"), lit(1L).as("c")))
      .localCheckpoint(false)
    (1 to rounds).foreach { r =>
      val (rule, mergedTrain) = round(vocab)
      // the rule LEARNED on the training vocab applies to ALL words.
      // Checkpoint cadence is per-chain, measured (NOTES_r10): `all` is
      // single-referenced per round, so a cadence-5 checkpoint saves 8
      // stage materializations of the distinct-words table per 10 rounds
      // and costs only deeper (≤5) nested-fold codegen — 2.9 → 2.6s warm
      // at sf0.1. Cadence 1 on vocab stands: round() reads it twice
      // (pairs + merge), and both the r9 everywhere-experiment and the
      // r10 vocab-only retry measured the uncheckpointed double
      // reference SLOWER (3.7s / 2.9s); zero `all` checkpoints also
      // loses (3.1s — 10 nested folds of optimizer/codegen depth).
      all = applyRule(all, rule)
      if (r % 5 == 0 || r == rounds) all = all.localCheckpoint(false)
      vocab = mergedTrain.localCheckpoint(false)
    }
    all.select(col("w"), size(col("syms")).as("n_tokens"))
  }

  private def applyRule(vocab: DataFrame, rule: DataFrame): DataFrame =
    vocab.crossJoin(broadcast(rule))
      .select(col("w"), col("c"),
        when(size(col("syms")) < 2, col("syms")).otherwise(
          aggregate(
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            slice(col("syms"), lit(1), lit(1)),
            (acc, x) =>
              when(element_at(acc, -1) === col("a") && x === col("b"),
                concat(slice(acc, lit(1), size(acc) - 1),
                  array(concat(col("a"), col("b")))))
                .otherwise(concat(acc, array(x)))))
          .as("syms"))

  /** Train `rounds` merge rules; returns one row per rule:
    * (round, a, b, merged, pair_count).
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int,
                  maxWords: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    var vocab = withSyms(wordTable(docs, textCol, maxWords))
    val rules = (1 to rounds).map { r =>
      // lazily checkpoint each vocab stage (the Graph.scala iteration
      // pattern): rule r's subtree otherwise contains the whole chain up
      // to r, so the union of R rules costs O(R²) corpus scans and the
      // nested fold expressions blow up optimizer/codegen memory; with
      // ≤maxWords-row stages materialized once, it is one corpus scan +
      // R tiny rounds, and the plan stays round-constant
      vocab = vocab.localCheckpoint(false)
      val (rule, merged) = round(vocab)
      vocab = merged
      rule.select(lit(r).as("round"), col("a"), col("b"),
        concat(col("a"), col("b")).as("merged"), col("pair_count"))
    }
    rules.reduce(_.unionAll(_)).orderBy("round")
  }
}
