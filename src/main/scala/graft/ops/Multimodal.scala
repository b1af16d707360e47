package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns with a typed metadata struct alongside. The
  * Spark-side mechanics — schema, batched per-partition processing, feature
  * schema, partition sizing — are real; the actual codec call is stubbed
  * behind [[decodeStub]] (no image/audio libraries in this environment) with
  * a deterministic fake so the pipeline is testable end-to-end.
  *
  * Scale notes: media blobs are large — the operators below never shuffle
  * the binary payload except where unavoidable (feature extraction is
  * map-only; downstream analytics should project the extracted features and
  * drop the blob before any join/agg). Batch shape: [[extractFeatures]]
  * iterates a partition in caller-defined batches, the same contract a GPU
  * inference step needs (`mapPartitions` ≈ `mapInPandas` batching in the
  * Python API).
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("source", StringType),
    StructField("n_bytes", LongType)
  ))

  /** Feature record produced per media item. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("brightness", DoubleType)
  ))

  /** Build a media table from any (id, payload-bytes-as-string) source —
    * the test harness derives one from `documents` (text bytes standing in
    * for an encoded image). Column shapes mirror a real ingest: payload as
    * `binary`, metadata as a struct.
    */
  def mediaTable(df: DataFrame, idCol: String, textCol: String,
                 sourceCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(textCol).cast(BinaryType).as("media"),
      struct(
        lit("image/fake").as("mime"),
        col(sourceCol).as("source"),
        length(col(textCol)).cast(LongType).as("n_bytes")
      ).as("meta"))

  /** STUB — stands in for a real image decode (no codec libs in this
    * container). Deterministic fake: "dimensions" and "brightness" derived
    * from payload bytes. The signature (bytes → (w, h, brightness)) is what
    * a real libjpeg/ffmpeg binding would have. [[encodePng]] stamps these
    * same dims into a REAL container header, which [[extractFeatures]]
    * parses back byte-by-byte — so the fake stops at pixel decoding; the
    * container layer is genuine.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Double) = {
    val n = payload.length
    val w = math.max(1, n % 1024)
    val h = math.max(1, (n / 1024) + 1)
    val brightness =
      if (n == 0) 0.0
      else payload.iterator.take(256).map(b => (b & 0xff).toDouble).sum /
        math.min(n, 256) / 255.0
    (w, h, brightness)
  }

  private val PngSignature =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Wrap `content` in a structurally REAL PNG container: the 8-byte
    * signature, an IHDR chunk (13 bytes: big-endian dims, bit depth 8,
    * grayscale), one IDAT chunk carrying `content` verbatim, and IEND —
    * every chunk with its genuine CRC-32 over type+data, which the parser
    * verifies. The one dishonesty, clearly labeled: a real encoder would
    * zlib-compress filtered scanlines into IDAT and the dims would come
    * from the actual image; here the dims are [[decodeStub]]'s
    * deterministic function of the content length (no codecs in this
    * environment). Everything a CONTAINER parser touches is real.
    */
  def encodePng(content: Array[Byte]): Array[Byte] = {
    val (w, h, _) = decodeStub(content)
    val out = new java.io.ByteArrayOutputStream(content.length + 69)
    PngSignature.foreach(out.write)
    def be(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be(data.length), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt), 0, 4)
    }
    // IHDR data: width, height, bit depth 8, color type 0 (grayscale),
    // compression 0, filter 0, interlace 0
    chunk("IHDR", be(w) ++ be(h) ++ Array[Byte](8, 0, 0, 0, 0))
    chunk("IDAT", content)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse a PNG container for real: verify the signature byte-by-byte,
    * walk the chunk list (big-endian length, 4-char type, data, CRC —
    * every CRC-32 recomputed and checked), read the IHDR dims, and
    * concatenate the IDAT payload. Returns (width, height, content).
    * Corrupt input fails loudly — exactly what a decode stage should do
    * at row level so the pipeline can route to a quarantine sink.
    */
  def parsePng(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(png.length >= 8, "truncated PNG: missing signature")
    var i = 0
    while (i < 8) {
      require((png(i) & 0xff) == PngSignature(i), s"bad PNG signature byte $i")
      i += 1
    }
    def be(p: Int): Int = ((png(p) & 0xff) << 24) | ((png(p + 1) & 0xff) << 16) |
      ((png(p + 2) & 0xff) << 8) | (png(p + 3) & 0xff)
    var (w, h) = (-1, -1)
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    while (p + 12 <= png.length) {
      val len = be(p)
      val typ = new String(png, p + 4, 4, "US-ASCII")
      require(len >= 0 && p + 12 + len <= png.length, s"truncated $typ chunk")
      val crc = new java.util.zip.CRC32()
      crc.update(png, p + 4, 4 + len)
      require(crc.getValue.toInt == be(p + 8 + len), s"CRC mismatch in $typ")
      typ match {
        case "IHDR" => w = be(p + 8); h = be(p + 12)
        case "IDAT" => idat.write(png, p + 8, len)
        case _      => () // ancillary chunks skipped, like a real decoder
      }
      p += 12 + len
    }
    require(w >= 0 && h >= 0, "no IHDR chunk")
    (w, h, idat.toByteArray)
  }

  /** [[mediaTable]] with the payload wrapped in the [[encodePng]]
    * container — the ingest shape where upstream hands the engine real
    * encoded files. Built per-partition (no shuffle); mime reflects the
    * container.
    */
  def encodedMediaTable(df: DataFrame, idCol: String, textCol: String,
                        sourceCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaSchema)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.select(col(idCol).cast(LongType), col(textCol), col(sourceCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val png = encodePng(
            Option(r.getString(1)).getOrElse("").getBytes("UTF-8"))
          Row(r.getLong(0), png,
            Row("image/png", r.getString(2), png.length.toLong))
        }
      }(enc)
  }

  /** Per-partition batched feature extraction over a PNG-container media
    * table ([[encodedMediaTable]]): the container is parsed for real
    * (signature, chunk walk, CRC checks, big-endian IHDR dims) and the
    * features describe the decoded CONTENT — its length, md5, and the
    * stub brightness (mean byte value; the pixel decode is the labeled
    * fake). `batchSize` models an inference micro-batch: the iterator is
    * consumed in groups so a real model binding would see fixed-size
    * tensors. Pure mapPartitions — no shuffle, blobs never leave their
    * input partition.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real implementation hands `batch` to the model as one tensor
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val (w, h, content) = parsePng(r.getAs[Array[Byte]](1))
          val bright =
            if (content.isEmpty) 0.0
            else content.iterator.take(256).map(b => (b & 0xff).toDouble).sum /
              math.min(content.length, 256) / 255.0
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(content).map("%02x".format(_)).mkString
          // half-away-from-zero at 1e-6 (math.rint is half-EVEN, which
          // diverges from SQL round() when the scaled value lands on an
          // exactly-representable .5)
          Row(id, content.length.toLong, digest, w, h,
            math.floor(bright * 1e6 + 0.5) / 1e6)
        }
      }
    }(enc)
  }

  /** STUB — stands in for a real image resize (no codec libs in this
    * container). Deterministic fake: the "resized" payload is a
    * proportionally sub-sampled byte slice (every ceil(n/target)-th byte,
    * truncated to `targetBytes`), metadata updated to the new size. The
    * contract is what a real binding would have: bytes → bytes with a
    * target dimension, applied batched per partition like
    * [[extractFeatures]].
    */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val stride = math.max(1,
        math.ceil(payload.length.toDouble / targetBytes).toInt)
      payload.indices.collect {
        case i if i % stride == 0 => payload(i)
      }.take(targetBytes).toArray
    }

  /** Batched per-partition resize over the media table: same mapPartitions
    * contract as [[extractFeatures]] — blobs never shuffle, the iterator is
    * consumed in inference-shaped batches. Output schema mirrors the input
    * (media_id, media, meta) with the payload and meta.n_bytes replaced.
    */
  def resizeMedia(media: DataFrame, targetBytes: Int,
                  batchSize: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaSchema)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    media.select("media_id", "media", "meta").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          val resized = resizeStub(bytes, targetBytes)
          Row(r.getLong(0), resized,
            Row(meta.getString(0), meta.getString(1), resized.length.toLong))
        }
      }
    }(enc)
  }

  /** Audio feature record produced per media item. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("level", DoubleType)
  ))

  /** Wrap `content` in a structurally REAL RIFF/WAVE container — the
    * little-endian complement of [[encodePng]]'s big-endian layer:
    * `RIFF`+size+`WAVE`, a 16-byte PCM `fmt ` chunk (format tag 1,
    * channels, sample rate, derived byte rate / block align, 16 bits), a
    * junk `LIST` chunk the parser must skip, then the `data` chunk with
    * `content` (odd lengths get the spec's pad byte). Every field is
    * genuinely assembled; only the notion that the bytes are PCM samples
    * is the stub layer.
    */
  def encodeWav(content: Array[Byte], sampleRate: Int,
                channels: Int): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
    val byteRate = sampleRate * channels * 2
    val blockAlign = channels * 2
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(blockAlign) ++ le16(16)
    val junk = "INFOengine".getBytes("US-ASCII")
    val dataPad = content.length % 2
    val riffSize = 4 + (8 + fmt.length) + (8 + junk.length) +
      (8 + content.length + dataPad)
    val out = new java.io.ByteArrayOutputStream(riffSize + 8)
    def ascii(s: String): Unit =
      out.write(s.getBytes("US-ASCII"), 0, 4)
    ascii("RIFF"); out.write(le32(riffSize), 0, 4); ascii("WAVE")
    ascii("fmt "); out.write(le32(fmt.length), 0, 4)
    out.write(fmt, 0, fmt.length)
    ascii("LIST"); out.write(le32(junk.length), 0, 4)
    out.write(junk, 0, junk.length)
    ascii("data"); out.write(le32(content.length), 0, 4)
    out.write(content, 0, content.length)
    if (dataPad == 1) out.write(0)
    out.toByteArray
  }

  /** Parse a RIFF/WAVE container for real: verify both magics, walk the
    * chunk list (little-endian sizes, word-aligned — odd chunks consume
    * their pad byte), read the PCM `fmt ` fields, require the declared
    * RIFF size to match the walked extent, skip unknown chunks exactly as
    * a decoder must. Returns (sampleRate, channels, data). Corrupt input
    * fails loudly for row-level quarantine routing.
    */
  def parseWav(wav: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(wav.length >= 12, "truncated WAV: missing RIFF header")
    def le32(p: Int): Int = (wav(p) & 0xff) | ((wav(p + 1) & 0xff) << 8) |
      ((wav(p + 2) & 0xff) << 16) | ((wav(p + 3) & 0xff) << 24)
    def le16(p: Int): Int = (wav(p) & 0xff) | ((wav(p + 1) & 0xff) << 8)
    def tag(p: Int): String = new String(wav, p, 4, "US-ASCII")
    require(tag(0) == "RIFF", "bad RIFF magic")
    require(le32(4) == wav.length - 8, "RIFF size != container extent")
    require(tag(8) == "WAVE", "bad WAVE magic")
    var (rate, channels) = (-1, -1)
    var data: Array[Byte] = null
    var p = 12
    while (p + 8 <= wav.length) {
      val typ = tag(p)
      val len = le32(p + 4)
      require(len >= 0 && p + 8 + len <= wav.length, s"truncated $typ chunk")
      typ match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          require(le16(p + 8) == 1, "not PCM")
          channels = le16(p + 10)
          rate = le32(p + 12)
        case "data" => data = java.util.Arrays.copyOfRange(wav, p + 8, p + 8 + len)
        case _      => () // LIST/JUNK etc. skipped, like a real decoder
      }
      p += 8 + len + (len % 2) // chunks are word-aligned
    }
    require(rate > 0 && channels > 0, "no fmt chunk")
    require(data != null, "no data chunk")
    (rate, channels, data)
  }

  /** [[mediaTable]] with the payload wrapped in [[encodeWav]] — the audio
    * ingest twin of [[encodedMediaTable]]. Sample rate and channel count
    * vary deterministically per id so the parse path is exercised across
    * fmt values. Built per-partition, no shuffle.
    */
  def encodedAudioTable(df: DataFrame, idCol: String, textCol: String,
                        sourceCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaSchema)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.select(col(idCol).cast(LongType), col(textCol), col(sourceCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val wav = encodeWav(
            Option(r.getString(1)).getOrElse("").getBytes("UTF-8"),
            sampleRate = 8000 * (1 + (id % 3).toInt),
            channels = 1 + (id % 2).toInt)
          Row(id, wav, Row("audio/wav", r.getString(2), wav.length.toLong))
        }
      }(enc)
  }

  /** Batched per-partition audio feature extraction over a WAV media
    * table: the container parse (magics, LE chunk walk, fmt fields, pad
    * bytes, size check) is real; duration derives from the parsed byte
    * rate; `level` is the mean data-byte amplitude (the sample decode is
    * the labeled stub — corpus is ASCII so byte==codepoint parity holds
    * for the oracle). Same inference-shaped `mapPartitions` batching as
    * [[extractFeatures]]; blobs never shuffle.
    */
  def extractAudioFeatures(media: DataFrame,
                           batchSize: Int = 64): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioFeatureSchema)
    media.select("media_id", "media").mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val (rate, channels, data) = parseWav(r.getAs[Array[Byte]](1))
          val byteRate = rate * channels * 2
          val durationMs = data.length.toDouble * 1000.0 / byteRate
          val level =
            if (data.isEmpty) 0.0
            else data.iterator.map(b => (b & 0xff).toDouble).sum /
              data.length / 255.0
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(data).map("%02x".format(_)).mkString
          // half-away-from-zero rounding, as extractFeatures documents
          Row(id, data.length.toLong, digest, rate, channels,
            math.floor(durationMs * 1e3 + 0.5) / 1e3,
            math.floor(level * 1e6 + 0.5) / 1e6)
        }
      }
    }(enc)
  }

  /** "Frame sampling": cut the payload into fixed-size slices and keep every
    * `stride`-th one — the video-frame analogue, as pure column expressions.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.withColumn("frames",
      when(octet_length(col("media")) === 0,
        array().cast("array<binary>"))   // empty payload → zero frames
      .otherwise(filter(
        transform(
          sequence(lit(0L),
            greatest(floor((octet_length(col("media")) - lit(1)) / lit(frameBytes))
              .cast("long"), lit(0L))),
          i => substring(col("media"), (i * frameBytes + 1).cast("int"),
            lit(frameBytes))),
        (_, i) => i % stride === 0)))
}
