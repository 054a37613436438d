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

  /** Resized-media row: payload replaced by the (stub) re-encoded
    * bytes; real dims recorded so downstream filters don't re-decode.
    */
  case class ResizedMedia(
      doc_id: Long,
      payload: Array[Byte],
      width: Int,
      height: Int,
  )

  /** STUB resize/re-encode: deterministic surrogate payload whose
    * content depends on (payload, target dims) — a real implementation
    * hands the bytes to a codec and re-encodes. Explicitly a stub.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload)
    md.update(s"${w}x$h".getBytes("UTF-8"))
    md.digest() // 16 surrogate bytes standing in for the re-encoded image
  }

  /** Batch resize over a binary column — same mapPartitions contract as
    * extractFeatures (codec init once per partition, constant memory);
    * the output is again a (doc_id, payload, meta) media table, so
    * resize stages compose/pipeline like any other DataFrame transform.
    */
  def resize(media: DataFrame, width: Int, height: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // Heavy codec init would happen HERE, once per partition.
        rows.map { case (id, payload) =>
          ResizedMedia(id, resizeStub(payload, width, height), width, height)
        }
      }
  }

  /** One sampled frame reference: which frame of which doc, plus a
    * deterministic digest standing in for the decoded frame bytes.
    */
  case class SampledFrame(doc_id: Long, frame_idx: Int, frame_digest: String)

  /** Frame sampling for video-shaped payloads: every `everyN`-th frame
    * index in [0, frame_count) becomes one output row — the
    * table-generating (explode) shape of multimodal processing. Frame
    * count comes from the (stub) decode; the per-row fan-out is done
    * with a plain iterator flatMap inside mapPartitions, so a 10k-frame
    * video streams its samples without materializing them.
    */
  def sampleFrames(media: DataFrame, everyN: Int): Dataset[SampledFrame] = {
    require(everyN > 0, "everyN must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, payload) =>
          val (_, _, frames) = decodeStub(payload)
          (0 until frames by everyN).iterator.map { idx =>
            md.reset()
            md.update(payload)
            md.update(BigInt(idx).toByteArray)
            SampledFrame(id, idx, md.digest().map("%02x".format(_)).mkString.take(16))
          }
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
