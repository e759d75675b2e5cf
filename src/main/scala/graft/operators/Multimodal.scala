package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as a partition-mapped typed stage.
  *
  * The decode itself is a STUB (no image/audio libs in this
  * container): [[decodeStub]] derives deterministic fake dimensions
  * from the content hash. Everything around it — schema, binary
  * column, partition batching, typed `mapPartitions` signature — is
  * the real Spark plumbing a production decoder (JNI/FFMPEG/etc.)
  * would plug into one partition-iterator at a time.
  *
  * Scale note: `mapPartitions` keeps per-partition decoder state
  * (model handles, codec contexts) initialized once per task rather
  * than per row; binary payloads stay columnar until the decode
  * boundary.
  */
object Multimodal {

  /** One asset: id + mime + raw bytes (A8-analog of the reference's
    * binary upload surface, pages/2_Creative_Uploader.py:74-140).
    */
  case class AssetRow(doc_id: Long, mime: String, content: Array[Byte])

  /** Extracted features (deterministic given content). */
  case class AssetFeatures(doc_id: Long, mime: String, byte_len: Long,
      content_hash: String, fake_width: Long, fake_height: Long)

  def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  /** Stubbed decoder: one hash pass per asset; "dimensions" are a
    * deterministic function of the hash so the oracle can recompute
    * them (`('0x'||substr(md5, ...)) % k + 1` in DuckDB).
    */
  def decodeStub(rows: Iterator[AssetRow]): Iterator[AssetFeatures] =
    rows.map { r =>
      val h = md5hex(r.content)
      AssetFeatures(r.doc_id, r.mime, r.content.length.toLong, h,
        java.lang.Long.parseLong(h.substring(0, 4), 16) % 640 + 1,
        java.lang.Long.parseLong(h.substring(4, 8), 16) % 480 + 1)
    }

  /** documents(text) -> asset table with a binary payload column. */
  def assetsFromDocuments(docs: DataFrame): Dataset[AssetRow] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), lit("text/plain").as("mime"),
      col("text").cast(BinaryType).as("content")).as[AssetRow]
  }

  /** Full decode stage: binary assets -> features, partition-mapped. */
  def extractFeatures(docs: DataFrame): Dataset[AssetFeatures] = {
    val s = docs.sparkSession
    import s.implicits._
    assetsFromDocuments(docs).mapPartitions(decodeStub)
  }
}
