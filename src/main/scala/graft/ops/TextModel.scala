package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical text-model operators for corpus curation: n-gram repetition
  * signals (the Gopher-style quality rules) and corpus bigram-LM document
  * scoring (the perplexity-filter shape used to rank crawl text against an
  * in-domain model).
  *
  * Scale shape:
  *   - repetition stats are per-document: explode n-grams, hash-aggregate
  *     twice on (doc, gram) then (doc) — the gram key never leaves the
  *     doc's rows, so both aggregates map-side combine and the shuffles
  *     carry one row per distinct per-doc gram, not per token;
  *   - the LM score is the classic two-shuffle join shape: exploded doc
  *     bigrams join the corpus bigram/unigram count tables on the gram key
  *     (map-side combined counts; broadcast at small vocab, shuffle-hash
  *     at web-corpus vocab), then re-aggregate per document. Nothing is
  *     ever collected; the "model" is a DataFrame, which at 100 TB is a
  *     persisted table the scorer joins against incremental crawl batches.
  */
object TextModel {

  /** Space-delimited token array (the corpus contract: pre-normalized
    * single-line text).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Contiguous word n-grams as a string array; empty when the doc has
    * fewer than `n` tokens.
    *
    * Built by zipping shifted SLICES of the token array, never by indexing
    * the outer array from inside a lambda: `element_at(w, i)` in a
    * transform looks harmless, but after Catalyst collapses projections
    * `w` is the tokenizer EXPRESSION, and the lambda would re-run it per
    * element — O(tokens²) per document. The zip form references `w` a
    * constant number of times and binds lambda variables, so the
    * tokenizer runs once regardless of how projections collapse. (r6:
    * this exact effect made `repetition_stats` ~7× slower than it should
    * be.)
    */
  def ngrams(w: Column, n: Int): Column = {
    require(n >= 1, "n-grams need n >= 1")
    val m = size(w) - (n - 1) // gram count when the doc is long enough
    val joined = (2 to n).foldLeft(slice(w, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(w, lit(j), m), (a, b) => concat(a, lit(" "), b))
    }
    when(size(w) >= n, joined).otherwise(array().cast("array<string>"))
  }

  /** Per-document n-gram repetition signals (Gopher-style quality rules):
    *
    *   - `top_bigram_frac`:  occurrences of the most frequent bigram / all
    *     bigram occurrences (boilerplate headers pin this near 1);
    *   - `dup_bigram_frac`:  occurrences of bigrams seen more than once /
    *     all bigram occurrences;
    *   - `dup_trigram_frac`: same at n=3 (longer grams separate natural
    *     repetition from copy-paste loops).
    *
    * All numerators/denominators are exact integer counts; the division is
    * rounded to 6 so both engines make identical keep/drop decisions when
    * the caller thresholds these columns. Docs with no bigrams emit null
    * fractions.
    */
  def repetitionStats(docs: DataFrame, id: String, text: String): DataFrame = {
    def frac(num: Column, denom: Column): Column =
      round(when(denom > 0, num.cast("double") / denom), 6)
    // ZERO exchanges: the stats are per-document, so they must never leave
    // the row — sort the doc's gram array and run-length scan it in one
    // aggregate() pass (r2..r5 shipped this as explode → two hash
    // aggregates → join-back; correct, but it shuffled every distinct
    // per-doc gram and re-joined, ~7x slower at sf0.1 and a pointless
    // exchange at 100 TB). Memory is bounded by the document itself: the
    // gram array is a constant factor of the text already in the row.
    docs
      .select(col(id).as("doc_id"), tokens(col(text)).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        runStats(ngrams(col("w"), 2)).as("b"),
        runStats(ngrams(col("w"), 3)).as("t"))
      .select(col("doc_id"), col("n_tokens"),
        frac(col("b.top"), col("b.tot")).as("top_bigram_frac"),
        frac(col("b.dup"), col("b.tot")).as("dup_bigram_frac"),
        frac(col("t.dup"), col("t.tot")).as("dup_trigram_frac"))
  }

  /** Run-length stats of a gram array in one in-row pass: sort, then scan
    * with an aggregate() state machine. Returns struct(top, dup, tot) —
    * the max multiplicity, the occurrences belonging to any gram seen
    * more than once, and the total count.
    */
  private def runStats(grams: Column): Column = {
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("top"), lit(0L).as("dup"),
      lit(0L).as("tot"))
    val scanned = aggregate(array_sort(grams), zero, (acc, x) => {
      val run = when(acc("prev") <=> x, acc("run") + 1L).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        greatest(acc("top"), run).as("top"),
        // a run contributes to dup from its 2nd member on — retroactively
        // count the 1st when the 2nd arrives
        (acc("dup") + when(run === 2L, 2L).when(run > 2L, 1L)
          .otherwise(0L)).as("dup"),
        (acc("tot") + 1L).as("tot"))
    })
    struct(scanned("top").as("top"), scanned("dup").as("dup"),
      scanned("tot").as("tot"))
  }

  /** Score every document under an add-one-smoothed bigram LM trained on
    * the corpus itself:
    *
    *   P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
    *
    * where `c(w1 ·)` counts bigrams starting with w1 and V is the corpus
    * unigram vocabulary size. Emits per-doc `n_bigrams` and
    * `avg_logp = avg(ln P)` (rounded to 6 — the sum order differs across
    * engines in the ULPs) plus the perplexity `exp(-avg_logp)` derived
    * from the ROUNDED average so it is a pure function both engines agree
    * on. Docs with fewer than 2 tokens emit no row.
    *
    * The smoothing means the same model scores unseen text (a held-out
    * crawl batch): out-of-model bigrams would need a LEFT join with
    * `coalesce(c12, 0)`; scoring the training corpus itself keeps the
    * joins inner.
    */
  def bigramLmScore(docs: DataFrame, id: String, text: String): DataFrame = {
    val w = docs.select(col(id).as("doc_id"), tokens(col(text)).as("w"))
    // zip of shifted slices, not element_at-in-lambda — see [[ngrams]]
    val m = size(col("w")) - 1
    val bg = w.select(col("doc_id"),
        explode(when(size(col("w")) >= 2,
          zip_with(slice(col("w"), lit(1), m), slice(col("w"), lit(2), m),
            (a, b) => struct(a.as("w1"), b.as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1  = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v   = w.select(explode(col("w")).as("t"))
      .agg(count_distinct(col("t")).cast("double").as("v"))
    // vocab-sized model tables: broadcast here; shuffle-hash at web scale
    val logp = log((col("c12") + 1.0) / (col("c1") + col("v")))
    bg.join(broadcast(c12), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg(logp), 6).as("avg_logp"))
      .withColumn("ppl", round(exp(-col("avg_logp")), 4))
  }
}
