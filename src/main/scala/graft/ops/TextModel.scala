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
    * fewer than `n` tokens. (Guarded: `sequence(0, negative)` would count
    * DOWN and fabricate grams.)
    */
  def ngrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(w, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

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
    val base = docs.select(col(id).as("doc_id"), tokens(col(text)).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        ngrams(col("w"), 2).as("bg"), ngrams(col("w"), 3).as("tg"))

    def gramStats(gram: String, prefix: String): DataFrame =
      base.select(col("doc_id"), explode(col(gram)).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as(s"${prefix}_tot"), max("c").as(s"${prefix}_top"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as(s"${prefix}_dup"))

    def frac(num: Column, denom: Column): Column =
      round(when(denom > 0, num.cast("double") / denom), 6)

    base.select("doc_id", "n_tokens")
      .join(gramStats("bg", "b"), Seq("doc_id"), "left")
      .join(gramStats("tg", "t"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        frac(col("b_top"), col("b_tot")).as("top_bigram_frac"),
        frac(col("b_dup"), col("b_tot")).as("dup_bigram_frac"),
        frac(col("t_dup"), col("t_tot")).as("dup_trigram_frac"))
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
    val bg = w.select(col("doc_id"),
        explode(when(size(col("w")) >= 2,
          transform(sequence(lit(0), size(col("w")) - 2),
            i => struct(element_at(col("w"), i + 1).as("w1"),
                        element_at(col("w"), i + 2).as("w2"))))
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
