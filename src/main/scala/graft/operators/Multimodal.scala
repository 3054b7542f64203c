package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — the container has
  * no media libraries — with a deterministic arithmetic fake
  * ([[MediaDecode.stubDecode]]). Everything around it is the real Spark
  * plumbing a 100 TB media pipeline needs: binary columns survive
  * parquet scans untouched (no decode on scan), metadata travels as plain
  * columns for pushdown/pruning, and the decode runs via `mapPartitions`
  * over a typed Dataset — one JVM-side batch per partition, the Scala
  * analog of `mapInPandas`, which is where a JNI/FFI codec would slot in.
  */
object Multimodal {

  /** A media row: opaque payload + source metadata. */
  case class MediaRow(media_id: Long, content: Array[Byte], media_type: String)

  /** Decoded metadata — what a real image decoder would yield. */
  case class DecodedMedia(media_id: Long, media_type: String,
      n_bytes: Int, width: Int, height: Int)

  object MediaDecode {
    /** STUB decoder: deterministic fake dimensions from payload size and
      * id. A real pipeline replaces ONLY this function with the codec
      * call; the surrounding batching/partitioning is unchanged. */
    def stubDecode(r: MediaRow): DecodedMedia = {
      val n = r.content.length
      DecodedMedia(
        media_id = r.media_id,
        media_type = r.media_type,
        n_bytes = n,
        width = ((n.toLong * 7919 + r.media_id * 31) % 640).toInt + 16,
        height = ((n.toLong * 104729 + r.media_id * 17) % 480).toInt + 16)
    }
  }

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (stand-in for image bytes), media_type derived from the source
    * tag. Binary stays opaque to the optimizer — exactly how real image
    * bytes should travel. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      concat(lit("image/src_"),
        regexp_extract(col("source"), "\\d+", 0)).as("media_type"))

  /** Partition-batched decode: the Scala analog of `mapInPandas` — each
    * partition's rows stream through the (stubbed) decoder without
    * per-row task overhead. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(MediaDecode.stubDecode))
  }

  /** Oracle twin of build+decode over `documents` (the stub arithmetic is
    * SQL-expressible by construction — that's what makes the plumbing
    * testable end-to-end). */
  val decodeSql: String =
    """SELECT doc_id AS media_id,
      |  'image/src_' || regexp_extract(source, '\d+', 0) AS media_type,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  CAST((octet_length(encode(text)) * 7919 + doc_id * 31) % 640 + 16 AS INTEGER) AS width,
      |  CAST((octet_length(encode(text)) * 104729 + doc_id * 17) % 480 + 16 AS INTEGER) AS height
      |FROM documents""".stripMargin
}
