package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** [[VectorQueries.decontaminateSemantic]] certification — the
  * embedding-grain decontamination contract on a one-hot fixture whose
  * geometry is exact:
  *
  *  - ids 0..15 carry one-hot 16-dim embeddings; id 0 is the `src0`
  *    benchmark, ids 1..15 the corpus (all `src1`);
  *  - the plant rule (`vec_id % 11 == 3`, target = id rounded down to a
  *    multiple of 20) selects exactly ids 3 and 14, both targeting
  *    bench 0: their embeddings become `e0 + 0.05·e_self`, cosine to
  *    bench 0 = 1/√1.0025 → round 6 = 0.998752;
  *  - every honest corpus vector is orthogonal to the benchmark
  *    (cosine 0), so with the 0.9 bar the flagged set IS the planted
  *    set — n_contaminated = n_hits = 2, max_cos = 0.998752;
  *  - cell routing: one-hot ids < 8 sit in their own centroid's cell,
  *    ids ≥ 8 tie at cosine 0 and break to centroid 0 — the bench item
  *    shares its cell with the planted docs, so the within-cell join
  *    sees them.
  */
class DecontaminateSemanticSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def fixtureDir(): String = {
    import spark.implicits._
    val dim = 16
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j == i % dim) 1.0f else 0.0f)
    val emb = (0 to 15).map(i => (i.toLong, oneHot(i), i % 3))
    val docs = (0 to 15).map(i =>
      (i.toLong, s"doc $i", "en", if (i == 0) "src0" else "src1", 5L))
    val dir = Files.createTempDirectory("decon_sem_fix").toString
    emb.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("the flagged set is exactly the planted set, with exact cosine") {
    val rows = VectorQueries.decontaminateSemantic(spark, fixtureDir())
      .collect()
    assert(rows.length == 1, "one corpus source")
    val r = rows.head
    assert(r.getAs[String]("source") == "src1")
    assert(r.getAs[Long]("n_docs") == 15L)
    assert(r.getAs[Long]("n_contaminated") == 2L, "ids 3 and 14 planted")
    assert(r.getAs[Long]("n_hits") == 2L,
      "each planted doc flags exactly its benchmark twin")
    assert(r.getAs[Double]("max_cos") == 0.998752,
      "cos(e0 + 0.05·e_self, e0) = 1/sqrt(1.0025), rounded to 6")
  }

  test("driver corpus: detection is plant-bounded, benchmark never " +
    "reports itself") {
    val rows = VectorQueries.decontaminateSemantic(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getAs[String]("source") == "src0"),
      "src0 is the benchmark, not a corpus source")
    val contaminated = rows.map(_.getAs[Long]("n_contaminated")).sum
    val hits = rows.map(_.getAs[Long]("n_hits")).sum
    // ids with id % 11 == 3 among 0..499 number 46; one (80) is src0
    // itself, so at most 45 corpus docs carry a plant. A planted doc can
    // fail to flag only through the documented IVF cell-boundary recall
    // trade — allow a small loss, never a gain.
    assert(contaminated <= 45L, "more flags than plants: false positives")
    assert(contaminated >= 40L, s"cell-boundary loss too large: $contaminated")
    assert(hits == contaminated,
      "honest cosines top out near 0.5 — every flagged doc has exactly " +
        "one benchmark twin")
    rows.filter(_.getAs[Long]("n_hits") > 0).foreach { r =>
      assert(r.getAs[Double]("max_cos") >= 0.99,
        s"${r.getAs[String]("source")}: planted cosine must be paraphrase-band")
    }
    rows.filter(_.getAs[Long]("n_hits") == 0).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("max_cos")),
        "no-hit sources carry a null max_cos, not a number")
    }
  }
}
