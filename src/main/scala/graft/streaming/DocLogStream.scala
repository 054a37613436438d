package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.TextPipeline
import graft.util.ManifestLog

/** The document-curation transaction over MANIFESTED logs — the same
  * semantics as [[DocStream]] (quality gate, within-batch dedup,
  * cross-batch dedup against the digest index the stream maintains),
  * with the two-table exactly-once re-derived from manifest commits
  * instead of the staged-marker protocol. The argument:
  *
  *  - [[ManifestLog.appendBatch]] is idempotent per table (the batch
  *    high-water mark), and
  *  - the batch computation is a DETERMINISTIC function of (batch,
  *    index state at high-water mark id−1) — gate and canonical-
  *    survivor dedup have no ties broken by chance, and the index
  *    probe reads a manifest-pinned file set that this batch's own
  *    half-published output can never leak into,
  *
  * so replaying a crash anywhere reproduces the same survivor set and
  * each table's append either lands once or no-ops. Commit order is
  * fixed (curated first, index second): a crash between them leaves
  * curated at hwm=id, index at id−1, and the replay recomputes from
  * the exact state attempt one saw, no-ops the curated append, and
  * completes the index. No markers, no undo pass, no batch-stamped
  * file names — and the manifest extras come free: pinned readers
  * mid-transaction, `readAt` time travel over the curated corpus, and
  * [[ManifestLog.tailSince]] as the downstream feed of survivors.
  *
  * [[DocStream]]'s `StagedCommit` protocol remains the right tool for
  * NON-manifested deployments (plain directories someone else owns);
  * where the engine owns the layout, this is the simpler machine.
  *
  * Scale shape: identical to [[DocStream]] — gate/dedup are map-side
  * plus one digest-keyed shuffle per batch; the index probe is an
  * anti-join against the at-rest index, never a history scan.
  */
object DocLogStream {

  /** The digest index's current state, or an empty frame before any
    * batch has landed digests.
    */
  private def digestIndex(spark: SparkSession, indexRoot: String): DataFrame =
    if (ManifestLog.versions(spark, indexRoot).nonEmpty &&
      ManifestLog.liveFileCount(spark, indexRoot) > 0)
      ManifestLog.read(spark, indexRoot).select("h").distinct()
    else {
      import spark.implicits._
      Seq.empty[String].toDF("h")
    }

  /** One micro-batch of the curation transaction — factored out so the
    * batch semantics (bootstrap, every crash window, all-duplicate
    * batches) are testable without a streaming harness. Returns
    * whether anything committed (false = replay of a fully committed
    * batch, or a no-data batch).
    */
  def curateBatch(batch: DataFrame, batchId: Long,
      curatedRoot: String, indexRoot: String): Boolean = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return false
    Seq(curatedRoot, indexRoot).foreach { r =>
      if (ManifestLog.versions(spark, r).isEmpty) ManifestLog.create(spark, r)
    }
    // Fully committed ⇔ BOTH tables recorded the batch. (curated
    // commits first, so curated-yes/index-no is the one torn state.)
    if (batchId <= math.min(
        ManifestLog.batchHwm(spark, curatedRoot),
        ManifestLog.batchHwm(spark, indexRoot))) return false

    val gated = TextPipeline.gate(batch)
    val unique = TextPipeline.dedup(gated).withColumn("h", md5(col("text")))
    // One evaluation for both appends. Determinism — not isolation —
    // is what the replay depends on: the index read above is already
    // pinned to a committed manifest generation.
    val fresh = unique.join(digestIndex(spark, indexRoot), Seq("h"), "left_anti")
      .localCheckpoint()
    if (fresh.isEmpty) {
      // Every row gated or deduplicated away: acknowledge the batch on
      // both tables so the replay guard answers without recompute.
      ManifestLog.recordBatch(spark, curatedRoot, batchId)
      ManifestLog.recordBatch(spark, indexRoot, batchId)
      return true
    }
    ManifestLog.appendBatch(fresh.drop("h")
        .repartitionByRange(1, col("doc_id")).sortWithinPartitions("doc_id"),
      curatedRoot, batchId, boundCol = Some("doc_id"))
    ManifestLog.appendBatch(fresh.select("h").repartition(1),
      indexRoot, batchId)
    true
  }

  /** Watch `srcDir` for document parquet drops and run the curation
    * transaction per micro-batch.
    */
  def runCurationStream(
      spark: SparkSession, srcDir: String, curatedRoot: String,
      indexRoot: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curateBatch(batch, batchId, curatedRoot, indexRoot)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
