package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake (clearly marked); the Spark-side plumbing — binary
  * schema, batch iteration via `mapPartitions`, metadata struct shape — is
  * real and tested. Swapping in a real decoder is a one-function change.
  *
  * Scale notes: `mapPartitions` keeps decode state (codec tables, model
  * weights) per-partition rather than per-row; binary payloads never
  * shuffle — only extracted metadata does.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                       height: Long, n_frames: Long)

  /** Pure-SQL metadata extraction over a binary payload column —
    * the fast path when the "decode" is expressible columnar. */
  def binaryMeta(docs: DataFrame): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    val nBytes = length(bin).cast("bigint") // length(binary) = byte count
    docs.select(
      col("doc_id"),
      nBytes.as("n_bytes"),
      ((nBytes * 2654435761L) % 1023L + 1L).as("width"),
      ((nBytes * 40503L) % 767L + 1L).as("height"),
      ceil(nBytes.cast("double") / 64.0).cast("bigint").as("n_frames"))
  }

  /** STUB decode — a real build links an image/audio library here and reads
    * pixel dims / frame counts from `payload`. The deterministic fake keeps
    * the pipeline testable in this container. Mirrors binaryMeta exactly. */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(docId, n, (n * 2654435761L) % 1023L + 1L,
      (n * 40503L) % 767L + 1L, math.ceil(n / 64.0).toLong)
  }

  /** Partition-batched decode: one decoder instance per partition, streaming
    * iterator (no materialization of the partition in memory). */
  def decodePartitions(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec tables etc.)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}
