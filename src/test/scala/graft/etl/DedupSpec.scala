package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Keep-first dedup semantics (reference `etl/orders_etl.py:77-79`:
  * `drop_duplicates(keep="first")`). The reference ships no tests for this
  * operator — these are new.
  */
class DedupSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("keepFirst keeps the row ranked first by the order column") {
    val df = Seq(
      (1L, "a", 10L, "first"),
      (1L, "a", 20L, "second"),
      (1L, "b", 5L, "only"),
      (2L, "a", 7L, "dup-late"),
      (2L, "a", 3L, "dup-early")
    ).toDF("k1", "k2", "seq", "tag")

    val out = Dedup.keepFirst(df, Seq("k1", "k2"), Seq(col("seq")))
      .select("k1", "k2", "tag").as[(Long, String, String)]
      .collect().toSet
    assert(out == Set((1L, "a", "first"), (1L, "b", "only"), (2L, "a", "dup-early")))
  }

  test("keepFirstFileOrder keeps the first occurrence in input order") {
    // single partition → monotonically_increasing_id encodes input order
    val df = Seq(
      (529629L, 1L, "keep"), (529629L, 1L, "drop"), (529629L, 2L, "keep2")
    ).toDF("order_source_id", "product_id", "tag").coalesce(1)

    val out = Dedup.keepFirstFileOrder(df, Seq("order_source_id", "product_id"))
      .select("tag").as[String].collect().toSet
    assert(out == Set("keep", "keep2"))
  }

  test("keepFirstFileOrder is deterministic over multi-file input (path order)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-dedup")
    // later-named file is LARGER — Spark packs partitions by size, which
    // would win under bare monotonically_increasing_id ordering
    Files.writeString(dir.resolve("part-a.csv"), "k,tag\n1,first\n")
    Files.writeString(dir.resolve("part-b.csv"),
      "k,tag\n" + (1 to 50).map(i => s"1,late$i").mkString("\n") + "\n")
    val df = spark.read.option("header", "true").csv(dir.toString)
    val out = Dedup.keepFirstFileOrder(df, Seq("k"))
      .select("tag").as[String].collect().toSeq
    assert(out == Seq("first"))   // from the lexicographically-first file
  }

  test("dedup row count never exceeds input and never loses keys") {
    val df = Seq.tabulate(100)(i => (i % 7L, i % 3L, i.toLong))
      .toDF("a", "b", "seq")
    val out = Dedup.keepFirst(df, Seq("a", "b"), Seq(col("seq")))
    assert(out.count() == 21)
    assert(out.select("a", "b").distinct().count() ==
      df.select("a", "b").distinct().count())
  }
}
