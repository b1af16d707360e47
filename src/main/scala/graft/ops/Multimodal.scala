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
    * a real libjpeg/ffmpeg binding would have.
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

  /** Per-partition batched feature extraction over the media table.
    * `batchSize` models an inference micro-batch: the iterator is consumed
    * in groups so a real model binding would see fixed-size tensors. Pure
    * mapPartitions — no shuffle, blobs never leave their input partition.
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
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, bright) = decodeStub(bytes)
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
          // half-away-from-zero at 1e-6 (math.rint is half-EVEN, which
          // diverges from SQL round() when the scaled value lands on an
          // exactly-representable .5)
          Row(id, bytes.length.toLong, digest, w, h,
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
