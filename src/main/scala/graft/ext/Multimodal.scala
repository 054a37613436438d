package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape (one partition streamed as an iterator, constant memory).
  * The codec itself is a STUB: no image/audio libraries exist in this
  * container, so `decodeStub` derives deterministic fake dimensions
  * from the payload bytes. Swapping in a real codec (JavaCV, TwelveMonkeys,
  * javax.imageio) changes ONLY the function body — the plumbing,
  * including the per-partition reuse pattern a heavyweight decoder
  * needs (init once per partition, not per row), stays identical.
  */
object Multimodal {

  /** Typed metadata row produced by feature extraction. */
  case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,   // stub-decoded
      height: Int,  // stub-decoded
      frame_count: Int,
      digest: String,
  )

  /** STUB decode: deterministic pseudo-dimensions from content bytes.
    * A real implementation would hand `payload` to a codec; marked
    * explicitly so it can't be mistaken for one.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 64 + math.floorMod(h, 1024)
    val height = 64 + math.floorMod(h >> 10, 1024)
    val frames = 1 + math.floorMod(h >> 20, 128)
    (width, height, frames)
  }

  /** Batch feature extraction over a binary column: mapPartitions so a
    * real codec initializes once per partition and the rows stream
    * through it — the Scala analog of mapInPandas' batched contract.
    * Input schema: (doc_id long, payload binary).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // Heavy codec init would happen HERE, once per partition.
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, payload) =>
          val (w, h, f) = decodeStub(payload)
          md.reset()
          val digest = md.digest(payload).map("%02x".format(_)).mkString.take(16)
          MediaFeature(id, payload.length, w, h, f, digest)
        }
      }
  }

  /** Build a media table from the documents corpus (text bytes standing
    * in for an encoded payload) — used by tests and demos; at rest this
    * would be a parquet table with a real binary column.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
}
