package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.TextPipeline

/** Streaming document curation — the incremental twin of
  * [[graft.pipeline.TextPipeline]]'s gate/dedup stages and the
  * declared q85 ingest pattern: documents arrive as parquet drops,
  * each micro-batch gates on quality, dedups WITHIN the batch
  * (canonical lowest-id survivor), then anti-joins the at-rest digest
  * index so nothing already curated is ingested twice; survivors
  * append to the curated corpus and their digests extend the index.
  *
  * foreachBatch rather than a declarative sink because the dedup must
  * READ state previous batches WROTE (the digest index) — a cyclic
  * dependency no append-only streaming sink can express; this is the
  * documented Structured Streaming pattern for such transactions.
  *
  * Exactly-once across the TWO tables (curated corpus + digest index)
  * comes from a staged, batch-stamped publish with a commit marker as
  * the single commit point — the filesystem stand-in for a table
  * format's multi-table transaction:
  *
  *  1. replay guard: if this batchId's commit marker exists, the batch
  *     fully committed — the replay is a no-op;
  *  2. undo: delete any live files stamped with this batchId in both
  *     dirs (leftovers of a crashed attempt's partial publish);
  *  3. stage: write both outputs under dot-prefixed staging dirs,
  *     which Spark's file index treats as hidden — readers can never
  *     observe in-flight data;
  *  4. publish: move the staged files into the live dirs under
  *     batch-stamped names;
  *  5. commit: create the marker LAST.
  *
  * A crash anywhere before step 5 leaves the marker absent, so the
  * checkpointed replay of the same batchId wipes the stamped files
  * (step 2) and re-runs — the corpus converges to exactly the
  * clean-run state, never a half batch. The index read still distincts
  * digests defensively, so even the transient pre-replay state only
  * degrades storage, never correctness of subsequent filtering.
  *
  * Scale shape: gate/dedup are map-side + one 16-byte-key shuffle per
  * batch (q78's rule); the index probe is a join keyed on the digest —
  * at rest the index is bucketed by digest prefix so a batch of B
  * rows probes it without scanning history (q85's posture).
  */
object DocStream {

  /** One micro-batch of the curation transaction — factored out so the
    * batch semantics (including crash replay) are testable without a
    * streaming harness.
    */
  private[streaming] def curateBatch(
      batch: DataFrame, batchId: Long,
      curatedDir: String, indexDir: String): Unit = {
    import StagedCommit._
    val spark = batch.sparkSession
    val fs = new Path(curatedDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = commitMarker(indexDir, batchId)
    if (fs.exists(marker)) return // fully committed — replay is a no-op
    // Undo a crashed attempt's partial publish BEFORE the index read:
    // this batch's own half-published digests must not anti-join its
    // replay away.
    deleteStamped(fs, curatedDir, batchId)
    deleteStamped(fs, indexDir, batchId)

    val gated = TextPipeline.gate(batch)
    val unique = TextPipeline.dedup(gated).withColumn("h", md5(col("text")))
    val fresh = unique.join(readDigestIndex(spark, indexDir), Seq("h"), "left_anti")
      .localCheckpoint() // evaluate the probe before the appends below change what it reads
    val curStage = s"$curatedDir/.staging-$batchId"
    val idxStage = s"$indexDir/.staging-$batchId"
    fresh.drop("h").write.mode("overwrite").parquet(curStage)
    fresh.select("h").write.mode("overwrite").parquet(idxStage)
    publishStaged(fs, curStage, curatedDir, batchId)
    publishStaged(fs, idxStage, indexDir, batchId)
    commit(fs, indexDir, batchId) // the commit point: marker present ⇔ both tables hold the batch
  }

  /** Watch `srcDir` for document parquet drops and run the curation
    * transaction per micro-batch.
    */
  def runCurationStream(
      spark: SparkSession, srcDir: String, curatedDir: String,
      indexDir: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        curateBatch(batch, batchId, curatedDir, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
