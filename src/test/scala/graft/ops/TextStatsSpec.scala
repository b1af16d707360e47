package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Language/script-ID classifier branches on a planted multilingual
  * corpus — the driver testdata draws every `lang` label from one
  * English-ish vocabulary, so the de/es/fr/zh branches can only be
  * exercised here (the `lang_id` oracle key covers en/und at scale).
  */
class TextStatsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def classify(rows: Seq[(Long, String)]): Map[Long, (String, Double)] =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextStats.langIdStruct(col("text"),
          split(coalesce(col("text"), lit("")), " ")).as("lid"))
      .select(col("doc_id"), col("lid.lang_pred"), col("lid.score"))
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("langIdStruct: every language branch fires on real sentences") {
    val got = classify(Seq(
      1L -> "the cat sat on the mat and it was happy with the sun",
      2L -> "der hund ist nicht in dem haus und die katze ist auf dem dach",
      3L -> "el perro es grande y la casa de los vecinos no es para nosotros",
      4L -> "le chien est dans la maison et les chats ne sont pas sur le toit",
      5L -> "这是一个中文句子 没有空格分词 但是汉字比例很高",
      6L -> "zxqv wrtk plmn asdf ghjk qwer uiop zxcv bnml hjkl"))
    assert(got(1L)._1 == "en")
    assert(got(2L)._1 == "de")
    assert(got(3L)._1 == "es")
    assert(got(4L)._1 == "fr")
    assert(got(5L)._1 == "zh")
    assert(got(6L)._1 == "und" && got(6L)._2 == 0.0)
    // scores are the winning overlap/charset fraction, in (0, 1]
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(i =>
      got(i)._2 > 0.0 && got(i)._2 <= 1.0))
  }

  test("langIdStruct: script routes fire on real sentences (ja/ko/ar/hi/th)") {
    val got = classify(Seq(
      // unsegmented Japanese: kana+Han mix, kana presence routes ja even
      // where Han alone would clear the zh bar
      1L -> "私は日本語を勉強しています",
      2L -> "日本語の文章です",
      // segmented but non-Latin scripts: the word layer scores zero on
      // these (no Latin profile hits) — before the script layer they
      // routed und
      3L -> "한국어 문장은 한글로 쓰여 있습니다",
      4L -> "هذه جملة باللغة العربية للاختبار",
      5L -> "यह हिंदी में लिखा गया वाक्य है",
      // unsegmented Thai — no spaces, no tokenizer, chars decide
      6L -> "นี่คือประโยคภาษาไทยไม่มีช่องว่าง",
      // pure Han stays zh: no kana anywhere, the ja rule cannot fire
      7L -> "这是一个中文句子没有空格分词"))
    assert(got(1L)._1 == "ja")
    assert(got(2L)._1 == "ja")
    assert(got(3L)._1 == "ko")
    assert(got(4L)._1 == "ar")
    assert(got(5L)._1 == "hi")
    assert(got(6L)._1 == "th")
    assert(got(7L)._1 == "zh")
    // scores are the routed script's fraction of non-space chars
    assert((1L to 7L).forall(i => got(i)._2 > 0.0 && got(i)._2 <= 1.0))
  }

  test("langIdStruct: ties break lexicographically; null text is und") {
    // 'la' and 'de' sit in BOTH the es and fr profiles — a text of only
    // shared words scores them equal, and the profile (lexicographic)
    // order must decide deterministically: es before fr
    val got = classify(Seq(
      1L -> "la de la de la de",
      2L -> null.asInstanceOf[String]))
    assert(got(1L)._1 == "es")
    assert(got(2L) == ("und", 0.0))
  }

  test("langIdMulti: the synthesized corpus routes every label through " +
    "its own classifier branch at scale") {
    // the remapped corpus puts REAL profile words (or Han ideographs)
    // under each label, so the oracle key exercises the de/es/fr/zh
    // branches the raw driver corpus cannot — de/es/fr/zh must agree
    // perfectly (each doc's tokens are drawn from its own profile), en
    // keeps the original English-ish text (high but not perfect: short
    // function-word-free docs fall to und)
    val got = graft.queries.TextQueries
      .langIdMulti(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set("de", "en", "es", "fr", "zh"))
    Seq("de", "es", "fr", "zh").foreach { l =>
      val (n, agree, rate, preds) = got(l)
      assert(n > 0 && agree == n && rate == 1.0 && preds == l,
        s"$l: n=$n agree=$agree rate=$rate preds=$preds")
    }
    val (nEn, agreeEn, rateEn, predsEn) = got("en")
    assert(nEn > 0 && rateEn >= 0.8 && agreeEn < nEn,
      s"en: n=$nEn agree=$agreeEn rate=$rateEn")
    assert(predsEn.split(",").toSet.subsetOf(Set("en", "und")), predsEn)
  }

  test("TokenSetCount: parity with the isin-filter HOF spelling, nulls " +
    "and empties included, and the codegen path is exercised") {
    val set = Seq("the", "a", "of")
    val rows = Seq(
      Seq("the", "cat", "the", "a", null, "of"),
      Seq.empty[String],
      Seq(""),
      null.asInstanceOf[Seq[String]],
      Seq("THE", "the ", "the")) // case- and whitespace-exact matching
    val df = rows.toDF("w")
    val native = graft.functions.TokenSetCountFunctions
      .tokenSetCount(col("w"), set)
    val hof = size(filter(col("w"), x => x.isin(set: _*)))
    val got = df.select(native.as("n"), hof.as("h")).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))))
    // HOF size(null array) is -1 (legacy size) vs native null — compare
    // where both are defined, and pin the native null contract
    rows.indices.foreach { i =>
      if (rows(i) == null) assert(got(i)._1.isEmpty, "null array -> null")
      else assert(got(i)._1 == got(i)._2, s"row $i diverged: ${got(i)}")
    }
    assert(got(0)._1.contains(4) && got(4)._1.contains(1))
    // the expression must codegen (no CodegenFallback): a projection
    // over a non-local child must stay inside a codegen stage (a plain
    // literal frame constant-folds to LocalTableScan, proving nothing)
    val fromShuffle = df.repartition(2).select(native.as("n"))
    assert(fromShuffle.collect().flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Int]).sorted.toSeq == Seq(0, 0, 1, 4),
      "codegen path returned different counts")
    // inspect the FINAL adaptive plan (the initial AQE print carries no
    // codegen annotation before stages materialize); the compact print
    // marks a whole-stage-codegen'd operator with the `*(n)` prefix
    assert(fromShuffle.queryExecution.executedPlan.toString
      .contains("*(1) Project [token_set_count"),
      "token_set_count fell out of whole-stage codegen")
  }

  test("quality filter language gate: optional stage, rule order pinned") {
    // rule order: empty → too_short → wrong_language → low_diversity →
    // no_stopwords. Doc 2 is German AND short — too_short must win;
    // doc 3 is German and long enough — wrong_language fires; doc 4 is
    // English but repetitive — low_diversity still fires AFTER the
    // language gate passes it; doc 1 passes everything.
    val en20 = "the cat sat on the mat and it was happy with the sun " +
      "in a warm place for hours today"
    val de10 = "der hund ist nicht in dem haus und die katze"
    val de25 = "der hund ist nicht in dem haus und die katze ist auf " +
      "dem dach weil der vogel nicht mit der maus in dem garten spielt"
    val rep25 = ("the dog " * 12).trim + " ran"
    val docs = Seq(
      (1L, en20), (2L, de10), (3L, de25), (4L, rep25)
    ).toDF("doc_id", "text")
    val gated = Curation.qualityFilter(docs, "doc_id", "text",
        Some(Seq("en")))
      .select("doc_id", "keep", "reject_reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(gated(1L) == ((true, None)))
    assert(gated(2L) == ((false, Some("too_short"))))
    assert(gated(3L) == ((false, Some("wrong_language"))))
    assert(gated(4L) == ((false, Some("low_diversity"))))
    // default (None) stays the historical three-rule chain: doc 3 is
    // fluent German long text — kept when no language gate is set
    val ungated = Curation.qualityFilter(docs, "doc_id", "text")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(ungated(3L))
  }
}
