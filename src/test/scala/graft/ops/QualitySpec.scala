package graft.ops

import graft.TestSpark
import graft.ops.Quality.RowCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("rowChecks: one aggregate pass, one result row per check") {
    val df = Seq((1L, 10.0, "F"), (2L, -5.0, "O"), (3L, 0.0, "X"))
      .toDF("id", "price", "status")
    val out = Quality.rowChecks(df, Seq(
        RowCheck("price_positive", col("price") <= 0.0),
        RowCheck("status_accepted", !col("status").isin("F", "O"))))
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      ("price_positive", 3L, 2L, false),
      ("status_accepted", 3L, 1L, false)))
  }

  test("uniquenessCheck counts all rows of a duplicated key") {
    val df = Seq(1L, 2L, 2L, 2L, 3L).toDF("k")
    val out = Quality.uniquenessCheck(df, "k_unique", Seq(col("k")))
      .as[(String, Long, Long, Boolean)].head()
    assert(out == ("k_unique", 5L, 3L, false))
  }

  test("referentialCheck counts orphan child rows") {
    val child = Seq(1L, 1L, 2L, 9L).toDF("ck")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.referentialCheck(child, col("ck"), parent, col("pk"),
        "fk").as[(String, Long, Long, Boolean)].head()
    assert(out == ("fk", 4L, 1L, false))
  }

  test("upsertLatest: latest change wins; insert/update/keep actions") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, 111.0, 1L), (1L, 999.0, 2L), // v2 wins for key 1
      (3L, 30.0, 1L))                   // new key → insert
      .toDF("k", "bal", "v")
    val out = Quality.upsertLatest(base, changes, "k",
        versionOrder = Seq(col("v").desc), payload = Seq("name", "bal"))
      .as[(Long, Option[String], Double, String)].collect().toSet
    assert(out == Set(
      (1L, Some("a"), 999.0, "update"),
      (2L, Some("b"), 20.0, "keep"),
      (3L, None, 30.0, "insert")))
  }

  test("tableDiff: presence split and null-safe per-column mismatches") {
    val left = Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, Some("c"), 3.0), (4L, None, 4.0)).toDF("k", "name", "bal")
    val right = Seq((1L, Some("a"), 1.0),      // identical
      (2L, Some("B"), 2.0),                    // name differs
      (4L, None, 40.0),                        // bal differs, null name equal
      (5L, Some("e"), 5.0))                    // only right
    .toDF("k", "name", "bal")
    val out = Quality.tableDiff(left, right, "k", Seq("name", "bal"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("only_left" -> 1L, "only_right" -> 1L,
      "n_common" -> 3L, "diff_name" -> 1L, "diff_bal" -> 1L))
  }

  test("dq suite over testdata: clean checks pass, the dirty one reports") {
    val out = graft.queries.QualityQueries
      .dqChecks(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Boolean)].collect()
    assert(out.length == 10)
    // the synthetic lineitem deliberately reuses (l_orderkey, l_linenumber)
    // — the suite must SURFACE that, not hide it
    val (dirty, clean) = out.partition(_._1 == "lineitem_line_unique")
    assert(dirty.head._3 > 0 && !dirty.head._4)
    assert(clean.forall(_._4), s"failing: ${clean.filterNot(_._4).toSeq}")
  }

  test("mergeCdc: latest delete supersedes older updates; missing-key delete is a no-op") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, 111.0, 1L, "U"), (1L, 999.0, 2L, "D"), // newer delete wins: key 1 gone
      (2L, 222.0, 2L, "U"), (2L, 0.0, 1L, "D"),   // older delete loses: key 2 updates
      (9L, 90.0, 1L, "D"))                        // delete of absent key: no-op
      .toDF("k", "bal", "v", "op")
    val out = Quality.mergeCdc(base, changes, "k",
        versionOrder = Seq(col("v").desc), payload = Seq("name", "bal"))
      .as[(Long, Option[String], Double, String)].collect().toSet
    assert(out == Set(
      (2L, Some("b"), 222.0, "update"),
      (3L, Some("c"), 30.0, "keep")))
  }

  test("mergeCdc: null op in the feed fails loudly, not a silent keep") {
    val base = Seq((1L, "a", 10.0)).toDF("k", "name", "bal")
    val changes = Seq((1L, Some(111.0), 1L, Option.empty[String]))
      .toDF("k", "bal", "v", "op")
    val e = intercept[Throwable] {
      Quality.mergeCdc(base, changes, "k",
        versionOrder = Seq(col("v").desc), payload = Seq("name", "bal"))
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(e).contains("mergeCdc"))
  }
}
