package graft.queries

import graft.etl.Readers
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing over a media table synthesized from `documents`
  * (text bytes standing in for encoded payloads — the container has no
  * codec libraries; see [[graft.ops.Multimodal.decodeStub]]).
  */
object MultimodalQueries {

  private val FrameBytes = 32
  private val Stride = 2

  private def media(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaTable(
      Readers.table(spark, dir, "documents"), "doc_id", "text", "source")

  /** Binary-column plumbing, oracle-checked: payload length, content
    * digest, metadata struct fields, and the frame-sampling count computed
    * by the real slicing operator (mirrored arithmetically in SQL).
    */
  def multimodalBinary(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(spark, dir), FrameBytes, Stride)
      .select(
        col("media_id"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        md5(col("media")).as("digest"),
        col("meta.mime").as("mime"),
        col("meta.source").as("source"),
        size(col("frames")).cast("long").as("n_frames"))
      .orderBy("media_id")

  val multimodalBinarySql: String =
    s"""SELECT doc_id AS media_id,
       |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
       |  md5(text) AS digest,
       |  'image/fake' AS mime,
       |  source,
       |  CAST((octet_length(text::BLOB) - 1) // $FrameBytes // $Stride + 1 AS BIGINT)
       |    AS n_frames
       |FROM documents ORDER BY media_id""".stripMargin

  /** Batched per-partition feature extraction over REAL PNG containers:
    * the media table wraps each document in a genuine PNG (signature,
    * IHDR, CRC-32s — [[graft.ops.Multimodal.encodePng]]) and the
    * extractor parses it back byte-by-byte (signature check, chunk walk,
    * CRC verification, big-endian IHDR dims) before computing content
    * features. The oracle checks the round trip arithmetically: the
    * parsed dims must equal the deterministic function of the content
    * length that was stamped into IHDR, and digest/brightness are
    * per-byte functions of the content (documents.text is pure ASCII in
    * the testdata, so code points == payload bytes). Only the pixel
    * decode itself is the labeled stub.
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(spark,
        Multimodal.encodedMediaTable(
          Readers.table(spark, dir, "documents"), "doc_id", "text", "source"))
      .orderBy("media_id")

  val multimodalFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST(greatest(1, octet_length(text::BLOB) % 1024) AS INTEGER) AS width,
      |  CAST(greatest(1, octet_length(text::BLOB) // 1024 + 1) AS INTEGER)
      |    AS height,
      |  CASE WHEN octet_length(text::BLOB) = 0 THEN 0.0::DOUBLE
      |       ELSE floor(list_sum(list_transform(
      |                regexp_extract_all(substr(text, 1, 256), '(?s).'),
      |                c -> unicode(c)))::DOUBLE
      |              / least(octet_length(text::BLOB), 256)::DOUBLE
      |              / 255.0::DOUBLE * 1000000.0::DOUBLE + 0.5::DOUBLE)
      |            / 1000000.0::DOUBLE
      |  END AS brightness
      |FROM documents ORDER BY media_id""".stripMargin

  /** Audio twin of [[multimodalFeatures]] over REAL RIFF/WAVE containers
    * ([[graft.ops.Multimodal.encodeWav]]/`parseWav` — little-endian chunk
    * walk, PCM fmt fields, pad bytes, a junk LIST chunk the parser must
    * skip, RIFF size check). The oracle reproduces the round trip
    * arithmetically: the parsed rate/channels must equal the
    * deterministic per-id fmt values that were stamped in; duration
    * derives from the parsed byte rate; level/digest are per-byte
    * functions of the content (ASCII corpus ⇒ code points == bytes).
    */
  def multimodalAudio(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractAudioFeatures(
        Multimodal.encodedAudioTable(
          Readers.table(spark, dir, "documents"), "doc_id", "text", "source"))
      .orderBy("media_id")

  val multimodalAudioSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST(8000 * (1 + doc_id % 3) AS INTEGER) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
      |  floor(octet_length(text::BLOB)::DOUBLE * 1000.0::DOUBLE
      |      / (8000 * (1 + doc_id % 3) * (1 + doc_id % 2) * 2)::DOUBLE
      |      * 1000.0::DOUBLE + 0.5::DOUBLE) / 1000.0::DOUBLE AS duration_ms,
      |  CASE WHEN octet_length(text::BLOB) = 0 THEN 0.0::DOUBLE
      |       ELSE floor(list_sum(list_transform(
      |                regexp_extract_all(text, '(?s).'),
      |                c -> unicode(c)))::DOUBLE
      |              / octet_length(text::BLOB)::DOUBLE
      |              / 255.0::DOUBLE * 1000000.0::DOUBLE + 0.5::DOUBLE)
      |            / 1000000.0::DOUBLE
      |  END AS level
      |FROM documents ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_binary" -> multimodalBinary,
    "multimodal_features" -> multimodalFeatures,
    "multimodal_audio" -> multimodalAudio
  )

  val oracle: Map[String, String] = Map(
    "multimodal_binary" -> multimodalBinarySql,
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_audio" -> multimodalAudioSql
  )
}
