package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TextModelSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionStats: hand-counted fractions on a repetitive doc") {
    // "a b a b a": bigrams {a b:2, b a:2} tot=4 top=2 dup=4;
    // trigrams {a b a:2, b a b:1} tot=3 dup=2
    val docs = Seq((1L, "a b a b a"), (2L, "x y z w")).toDF("doc_id", "text")
    val out = TextModel.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 5L, 0.5, 1.0, 0.666667)))
    // all-distinct doc: top bigram frac = 1/3, zero duplication
    assert(out(2L) == ((2L, 4L, 0.333333, 0.0, 0.0)))
  }

  test("repetitionStats: doc shorter than the gram emits null fractions") {
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    val row = TextModel.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(row == ((1L, 1L, None, None, None)))
  }

  test("bigramLmScore matches an independently-computed add-one model") {
    val corpus = Seq((1L, "a b a"), (2L, "b a c")).toDF("doc_id", "text")
    // corpus bigrams: (a,b) (b,a) [doc1], (b,a) (a,c) [doc2]
    // c(a,·)=2 c(b,·)=2 ; c(a,b)=1 c(b,a)=2 c(a,c)=1 ; V=3
    val v = 3.0
    def p(c12: Int, c1: Int) = (c12 + 1.0) / (c1 + v)
    val exp1 = (math.log(p(1, 2)) + math.log(p(2, 2))) / 2 // doc 1
    val exp2 = (math.log(p(2, 2)) + math.log(p(1, 2))) / 2 // doc 2
    val out = TextModel.bigramLmScore(corpus, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out(1L)._2 == 2L && out(1L)._3 == r6(exp1))
    assert(out(2L)._2 == 2L && out(2L)._3 == r6(exp2))
    // higher avg log-prob ⇔ lower perplexity, ppl = exp(-avg)
    assert(out(1L)._4 == math.round(math.exp(-out(1L)._3) * 1e4) / 1e4)
  }
}
