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

  /** Frame-sampling plumbing: every `step`-th frame index per media doc.
    * A real build replaces the index stream with actual frame extraction;
    * the fan-out shape (doc → frames, columnar explode, no shuffle) is the
    * part that matters at scale. */
  def frameSample(docs: DataFrame, step: Int = 8): DataFrame =
    binaryMeta(docs)
      .filter(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(step.toLong)))
          .as("frame_idx"))

  /** STUB feature extraction (decode→resize→embed in a real build): a
    * deterministic `dim`-dim vector derived from payload size. The Spark
    * plumbing — binary in, fixed-width vector out, columnar, no shuffle —
    * is the real contract; the arithmetic is a placeholder. */
  def mediaFeatures(docs: DataFrame, dim: Int = 8): DataFrame =
    binaryMeta(docs).select(col("doc_id"),
      transform(sequence(lit(1L), lit(dim.toLong)),
        i => ((col("n_bytes") * i) % 997L).cast("double") / lit(997.0))
        .as("features"))

  /** Multimodal packing: documents ⋈ embeddings by id into one frame with
    * an opaque payload struct + typed vector column (SURVEY.md §7.5). The
    * id equi-join shuffles only ids+vectors, never decoded media. */
  def packMedia(docs: DataFrame, emb: DataFrame): DataFrame =
    docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("label"),
        struct(col("source"),
          encode(col("text"), "UTF-8").as("payload")).as("media"),
        col("embedding"))
}
