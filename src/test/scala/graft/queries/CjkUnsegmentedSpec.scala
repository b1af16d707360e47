package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[TextQueries.cjkUnsegmented]] certification — the unsegmented-CJK
  * contract on a planted corpus whose remapped shapes are known exactly
  * (the remap keys on token LENGTH mod 15, so same-length-pattern docs
  * collapse to identical Han strings):
  *
  *  - charset routing: every doc classifies `zh` with NO tokenizer help
  *    (the space-split word layer sees one doc-sized token and scores 0);
  *  - word-grain honesty: `word_spans` is 0 for every unsegmented doc —
  *    the silent degradation the key exists to expose;
  *  - char-grain dedup signal: the twin docs share their (single
  *    distinct) 16-char fingerprint, the distinct-pattern doc shares
  *    nothing, and the short doc (< 16 chars) has no fingerprints at
  *    all yet still routes `zh`.
  */
class CjkUnsegmentedSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def fixtureDir(): String = {
    import spark.implicits._
    def words(len: Int, n: Int, tag: String): String =
      (1 to n).map(i => (tag + i.toString * len).take(len)).mkString(" ")
    val rows = Seq(
      // twins: 20 tokens of length 1 each → the same single Han char
      // (length-bucket 2) repeated 20× for both docs
      (1L, "zh", "src1", words(1, 20, "a")),
      (2L, "zh", "src1", words(1, 20, "b")),
      // distinct pattern: 20 tokens of length 2 → a different Han char
      // (length-bucket 3) repeated — no window shared with the twins
      (3L, "zh", "src1", words(2, 20, "c")),
      // short: 10 tokens of length 1 → 10 chars < CjkSpanChars
      (4L, "zh", "src1", words(1, 10, "d")))
    val dir = Files.createTempDirectory("cjk_unseg_fix").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("charset routes zh, word grain degrades to zero, char grain dedups") {
    val rows = TextQueries.cjkUnsegmented(spark, fixtureDir()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 4)
    rows.values.foreach { r =>
      assert(r.getAs[String]("lang_pred") == "zh",
        s"doc ${r.getAs[Long]("doc_id")} routed ${r.getAs[String]("lang_pred")}")
      assert(r.getAs[Long]("word_spans") == 0L,
        "word-grain spans must be zero on unsegmented text")
    }
    // twins: one distinct 16-char window each (all windows identical in a
    // single-char-repeat string), and it is cross-doc
    Seq(1L, 2L).foreach { id =>
      assert(rows(id).getAs[Long]("n_chars") == 20L)
      assert(rows(id).getAs[Long]("char_fps") == 1L)
      assert(rows(id).getAs[Long]("char_fps_shared") == 1L,
        s"doc $id: twin fingerprint not detected as shared")
    }
    // the distinct-pattern doc shares nothing
    assert(rows(3L).getAs[Long]("char_fps") == 1L)
    assert(rows(3L).getAs[Long]("char_fps_shared") == 0L)
    // the short doc has no char fingerprints but still routes zh
    assert(rows(4L).getAs[Long]("n_chars") == 10L)
    assert(rows(4L).getAs[Long]("char_fps") == 0L)
    assert(rows(4L).getAs[Long]("char_fps_shared") == 0L)
  }

  test("driver corpus: every doc routes zh or und, never a word-profile language") {
    val rows = TextQueries.cjkUnsegmented(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[String]("lang_pred")
      assert(p == "zh" || p == "und",
        s"doc ${r.getAs[Long]("doc_id")}: word-profile prediction $p on " +
          "unsegmented Han text")
      assert(r.getAs[Long]("word_spans") == 0L)
    }
  }
}
