package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world payload", "srcA"),
    (2L, "x", "srcB"),
    (3L, "a" * 100, "srcA"),
    (4L, "", "srcB")
  ).toDF("doc_id", "text", "source")

  test("mediaTable: binary payload + typed metadata struct") {
    val m = Multimodal.mediaTable(docs, "doc_id", "text", "source")
    assert(m.schema("media").dataType.typeName == "binary")
    val r = m.filter($"media_id" === 1L)
      .select($"meta.mime", $"meta.source", $"meta.n_bytes",
        octet_length($"media"))
      .collect()(0)
    assert(r.getString(0) == "image/fake" && r.getString(1) == "srcA")
    assert(r.getLong(2) == 19L && r.getInt(3) == 19)
  }

  test("extractFeatures: batched mapPartitions, real PNG header parse") {
    val m = Multimodal.encodedMediaTable(docs, "doc_id", "text", "source")
    // the payload really is a PNG container now, bigger than the content
    val payloadLen = m.filter($"media_id" === 1L)
      .select(octet_length($"media")).as[Int].collect()(0)
    assert(payloadLen > 19)
    val f = Multimodal.extractFeatures(spark, m, batchSize = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(f.size == 4)
    val r1 = f(1L)
    assert(r1.getLong(1) == 19L)                   // content n_bytes
    val (w, h, bright) = Multimodal.decodeStub(
      "hello world payload".getBytes("UTF-8"))
    // dims round-tripped through the big-endian IHDR bytes
    assert(r1.getInt(3) == w && r1.getInt(4) == h)
    assert(math.abs(r1.getDouble(5) - math.rint(bright * 1e6) / 1e6) < 1e-9)
    // digest is over the decoded CONTENT, not the container
    val md5Engine = docs.filter($"doc_id" === 1L)
      .select(md5($"text".cast("binary"))).as[String].collect()(0)
    assert(r1.getString(2) == md5Engine)
  }

  test("encodePng/parsePng round-trip; corruption fails the CRC") {
    val content = "the quick brown fox".getBytes("UTF-8")
    val png = Multimodal.encodePng(content)
    // real signature bytes
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N')
    val (w, h, back) = Multimodal.parsePng(png)
    val (ew, eh, _) = Multimodal.decodeStub(content)
    assert(w == ew && h == eh)
    assert(back.sameElements(content))
    // flip one content byte → IDAT CRC must catch it
    val corrupt = png.clone()
    corrupt(40) = (corrupt(40) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](Multimodal.parsePng(corrupt))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("IHDR") ||
      e.getMessage.contains("chunk"))
  }

  test("resizeMedia: payload shrunk to target, metadata updated, small pass through") {
    val m = Multimodal.mediaTable(docs, "doc_id", "text", "source")
    val out = Multimodal.resizeMedia(m, targetBytes = 10)
      .select($"media_id", octet_length($"media").cast("int").as("n"),
        $"meta.n_bytes".as("meta_n"))
      .as[(Long, Int, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // doc3 is 100 bytes → resized to ≤10, meta tracks the new size
    assert(out(3L)._1 <= 10 && out(3L)._1 == out(3L)._2)
    // doc2 (1 byte) passes through untouched
    assert(out(2L) == (1, 1L))
    // deterministic: same input → same bytes
    val a = Multimodal.resizeMedia(m, 10).filter($"media_id" === 3L)
      .select($"media".cast("string")).as[String].collect()(0)
    val b = Multimodal.resizeMedia(m, 10).filter($"media_id" === 3L)
      .select($"media".cast("string")).as[String].collect()(0)
    assert(a == b)
  }

  test("sampleFrames: slicing and stride arithmetic") {
    val m = Multimodal.mediaTable(docs, "doc_id", "text", "source")
    val framed = Multimodal.sampleFrames(m, frameBytes = 8, stride = 2)
      .select($"media_id", size($"frames").as("n"))
      .as[(Long, Int)].collect().toMap
    // doc1: 19 bytes → slices ceil(19/8)=3 (i=0,1,2) → kept i∈{0,2} = 2
    assert(framed(1L) == 2)
    // doc2: 1 byte → 1 slice → kept 1
    assert(framed(2L) == 1)
    // doc3: 100 bytes → 13 slices → kept i∈{0,2,..,12} = 7
    assert(framed(3L) == 7)
    // doc4: empty payload → zero frames (matches the oracle arithmetic)
    assert(framed(4L) == 0)
    // frame contents are the real byte slices
    val frames = Multimodal.sampleFrames(m, 8, 2)
      .filter($"media_id" === 1L)
      .select(transform($"frames", b => b.cast("string")))
      .as[Seq[String]].collect()(0)
    // slices: i=0 "hello wo", i=1 "rld payl" (dropped), i=2 "oad"
    assert(frames == Seq("hello wo", "oad"))
  }

  test("WAV container round-trips: fmt fields, data bytes, junk chunk skipped") {
    val content = "pcm-ish payload bytes".getBytes("UTF-8") // odd length: pad path
    val wav = Multimodal.encodeWav(content, sampleRate = 16000, channels = 2)
    val (rate, ch, data) = Multimodal.parseWav(wav)
    assert(rate == 16000 && ch == 2)
    assert(data.toSeq == content.toSeq)
    // declared RIFF size matches the container extent (parse enforces it)
    assert(((wav(4) & 0xff) | ((wav(5) & 0xff) << 8) |
      ((wav(6) & 0xff) << 16) | ((wav(7) & 0xff) << 24)) == wav.length - 8)
  }

  test("WAV parse rejects corruption loudly") {
    val wav = Multimodal.encodeWav("abcd".getBytes("UTF-8"), 8000, 1)
    intercept[IllegalArgumentException] {
      Multimodal.parseWav(wav.take(10)) // truncated header
    }
    val badMagic = wav.clone(); badMagic(8) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.parseWav(badMagic))
    val badSize = wav.clone(); badSize(4) = (badSize(4) + 1).toByte
    intercept[IllegalArgumentException](Multimodal.parseWav(badSize))
  }

  test("extractAudioFeatures parses real containers batched per partition") {
    val docs = Seq((1L, "hello world", "s1"), (2L, "x", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Multimodal.extractAudioFeatures(
        Multimodal.encodedAudioTable(docs, "doc_id", "text", "source"),
        batchSize = 1)
      .orderBy("media_id")
      .collect()
    // id 1: rate 8000*(1+1%3)=16000, channels 1+1%2=2, 11 bytes
    val r1 = out(0)
    assert(r1.getLong(1) == 11L && r1.getInt(3) == 16000 && r1.getInt(4) == 2)
    // duration = 11*1000/(16000*2*2) ms, rounded half-away at 1e-3
    assert(r1.getDouble(5) == math.floor(11.0 * 1000 / 64000 * 1e3 + 0.5) / 1e3)
    // id 2: rate 8000*3=24000, channels 1, level = 'x'/255
    val r2 = out(1)
    assert(r2.getInt(3) == 24000 && r2.getInt(4) == 1)
    assert(r2.getDouble(6) == math.floor('x'.toInt / 255.0 * 1e6 + 0.5) / 1e6)
  }
}
