package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Similarity scorer goldens from the reference
  * (`tests/test_orders_etl.py:148-200`) — these lock in the cross-wired
  * weight constants as the spec.
  */
class SimilaritySpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val products = Seq(
    (536469L, 749.0, "Для активного відпочинку", "Bugs"),
    (296597L, 199.0, "Дитячі машинки", "CARS"),
    (385613L, 199.0, "Ігрові фігурки", "CARS"),
    (516423L, 219.0, "Дитячі машинки", "CARS"),
    (516425L, 299.0, "Дитячі машинки", "CARS"),
    (427227L, 329.0, "Дитячі машинки", "LENA"),
    (439541L, 810.0, "Дитячі машинки", "LENA"),
    (528462L, 219.0, "Дитячі машинки", "LENA")
  ).toDF("product_id", "price", "goods_group", "manufacturer")

  test("golden candidate scores vs target 516423") {
    val expected = Map(
      536469L -> 0.08772, 296597L -> 0.9726, 385613L -> 0.4726,
      516423L -> 1.0, 516425L -> 0.91973, 427227L -> 0.6997,
      439541L -> 0.58111, 528462L -> 0.8)
    val got = Similarity
      .findSimilar(products, 516423L, expected.keys.toSeq)
      .as[(Long, Double)].collect().toMap
    assert(got == expected)
  }

  test("tier-2 UDF (SQL surface) reproduces the same goldens") {
    Similarity.registerUdf(spark)
    products.createOrReplaceTempView("sim_products")
    val got = spark.sql(
      """SELECT c.product_id,
        |  similarity_score(c.price, c.goods_group, c.manufacturer,
        |                   t.price, t.goods_group, t.manufacturer) AS score
        |FROM sim_products c, (SELECT * FROM sim_products WHERE product_id = 516423) t
      """.stripMargin).as[(Long, Double)].collect().toMap
    val expected = Map(
      536469L -> 0.08772, 296597L -> 0.9726, 385613L -> 0.4726,
      516423L -> 1.0, 516425L -> 0.91973, 427227L -> 0.6997,
      439541L -> 0.58111, 528462L -> 0.8)
    assert(got == expected)
  }

  test("score bounds: 0 < s <= 1 for positive prices") {
    val got = Similarity
      .findSimilar(products, 536469L, products.select("product_id").as[Long].collect())
      .as[(Long, Double)].collect()
    assert(got.length == 8)
    got.foreach { case (_, s) => assert(s > 0.0 && s <= 1.0) }
  }
}
