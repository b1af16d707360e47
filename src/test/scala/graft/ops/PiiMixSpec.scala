package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII redaction + weighted mixture sampling. */
class PiiMixSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Curation.redactPii($"t").as("r"))
      .as[String].head()

  test("redactPii replaces emails, phones, and IPv4s, keeps the rest") {
    assert(redact("write to jo.doe+x@sub.example.co today")
      == "write to <EMAIL> today")
    assert(redact("call +1-555-012-3456 now") == "call <PHONE> now")
    assert(redact("host 192.168.0.17 down") == "host <IP> down")
    assert(redact("a@b.io and 10.0.0.1 and +44-201-555-0199")
      == "<EMAIL> and <IP> and <PHONE>")
    assert(redact("no pii here, just words") == "no pii here, just words")
  }

  test("redactPii does not treat a redacted email's domain as an IP") {
    // order matters: the email goes first, so its dotted domain can never
    // be re-matched by the looser IP pattern
    assert(redact("u1@m5.org") == "<EMAIL>")
  }

  test("piiCounts counts matches per pattern on the raw text") {
    val row = Seq("a@b.co c@d.org 1.2.3.4").toDF("t")
      .select(Curation.piiCounts($"t"): _*)
      .as[(Long, Long, Long)].head()
    assert(row == ((2L, 0L, 1L)))
  }

  test("weightedKeep: 10000 bps keeps all, 0 keeps none, rate is ~bps") {
    val df = (1L to 4000L).toDF("id")
    def kept(bps: Long): Long =
      df.filter(Sampling.weightedKeep($"id", lit(bps))).count()
    assert(kept(10000) == 4000L)
    assert(kept(0) == 0L)
    val atQuarter = kept(2500)
    assert(math.abs(atQuarter - 1000L) < 150, s"got $atQuarter")
    // decision is a pure function of the key: repartitioning changes nothing
    val a = df.filter(Sampling.weightedKeep($"id", lit(2500L)))
      .as[Long].collect().toSet
    val b = df.repartition(13)
      .filter(Sampling.weightedKeep($"id", lit(2500L)))
      .as[Long].collect().toSet
    assert(a == b)
  }
}
