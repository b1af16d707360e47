package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TextQueries.langIdScripts]] certification — the script-routing
  * contract beyond Han on a planted corpus whose remapped shapes are
  * known exactly (the remap keys on token LENGTH mod 8: lengths 0–5 hit
  * the ja vocabulary's kana slots, lengths 6–7 its Han slots, so a doc's
  * length pattern decides its script mix):
  *
  *  - kana presence routes ja; a doc whose words ALL land on the Han
  *    slots is pure-Han text and must route `zh` — surfaced in `preds`,
  *    not hidden in the rate;
  *  - unsegmented honesty: ja and th aggregate `word_spans` 0 while the
  *    spaced scripts (ko/ar/hi) keep their word grain;
  *  - char-grain dedup generalizes: the twin docs share a 16-char
  *    fingerprint in BOTH unsegmented scripts, the pure-Han doc shares
  *    nothing, the short doc (< 16 chars) contributes no fingerprints;
  *  - the char pass is not run for spaced scripts (`char_dup_docs`
  *    null).
  */
class LangIdScriptsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def fixtureDir(): String = {
    import spark.implicits._
    def words(len: Int, n: Int, tag: String): String =
      (1 to n).map(i => (tag + i.toString * len).take(len)).mkString(" ")
    val rows = Seq(
      // twins: 20 tokens of length 1 each → the same single kana (ja) /
      // Thai char repeated 20× for both docs
      (1L, "en", "src1", words(1, 20, "a")),
      (2L, "en", "src1", words(1, 20, "b")),
      // all-Han trap: 20 tokens of length 6 land on the ja vocabulary's
      // 日 slot — zero kana, so the ja rule must NOT fire and the doc
      // routes zh (in th it is just another repeated char, routed th)
      (3L, "en", "src1", words(6, 20, "c")),
      // short: 10 tokens of length 1 → 10 chars < CjkSpanChars
      (4L, "en", "src1", words(1, 10, "d")))
    val dir = Files.createTempDirectory("lang_scripts_fix").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("script routing, unsegmented honesty, char-grain dedup on the " +
    "planted corpus") {
    val rows = TextQueries.langIdScripts(spark, fixtureDir()).collect()
      .map(r => r.getAs[String]("lang_label") -> r).toMap
    assert(rows.keySet == Set("ja", "ko", "ar", "hi", "th"))
    rows.values.foreach(r => assert(r.getAs[Long]("n_docs") == 4L))
    // ja: the all-Han doc routes zh (kana presence rule), the rest ja
    assert(rows("ja").getAs[Long]("n_agree") == 3L)
    assert(rows("ja").getAs[String]("preds") == "ja,zh")
    // th and the spaced scripts agree everywhere (single-script synth)
    Seq("ko", "ar", "hi", "th").foreach { l =>
      assert(rows(l).getAs[Long]("n_agree") == 4L, s"$l n_agree")
      assert(rows(l).getAs[String]("preds") == l, s"$l preds")
      assert(rows(l).getAs[Double]("agree_rate") == 1.0, s"$l rate")
    }
    // unsegmented scripts lose the word grain entirely...
    Seq("ja", "th").foreach(l =>
      assert(rows(l).getAs[Long]("word_spans") == 0L, s"$l word grain"))
    // ...while spaced scripts keep it: (20-7)*3 + (10-7) = 42
    Seq("ko", "ar", "hi").foreach(l =>
      assert(rows(l).getAs[Long]("word_spans") == 42L, s"$l word grain"))
    // char-grain dedup: only the twins share (the all-Han/distinct doc
    // shares nothing, the short doc has no windows at all)
    Seq("ja", "th").foreach(l =>
      assert(rows(l).getAs[Long]("char_dup_docs") == 2L, s"$l dup docs"))
    // the char pass is not run for spaced scripts — null, not 0
    Seq("ko", "ar", "hi").foreach(l =>
      assert(rows(l).isNullAt(rows(l).fieldIndex("char_dup_docs")),
        s"$l must not carry a char-dedup count"))
  }

  test("driver corpus: five rows, structural invariants hold") {
    val rows = TextQueries.langIdScripts(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("lang_label") -> r).toMap
    assert(rows.keySet == Set("ja", "ko", "ar", "hi", "th"))
    Seq("ja", "th").foreach { l =>
      assert(rows(l).getAs[Long]("word_spans") == 0L)
      assert(!rows(l).isNullAt(rows(l).fieldIndex("char_dup_docs")))
    }
    Seq("ko", "ar", "hi").foreach { l =>
      assert(rows(l).getAs[Long]("word_spans") > 0L)
      assert(rows(l).isNullAt(rows(l).fieldIndex("char_dup_docs")))
      // single-script synth can only route its own script or und
      assert(rows(l).getAs[String]("preds").split(",")
        .forall(p => p == l || p == "und"))
    }
  }
}
