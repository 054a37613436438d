package graft.streaming

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
  * Exactly-once caveat, stated honestly: the checkpoint makes batch
  * REPLAY possible after a crash mid-foreachBatch, and two plain
  * parquet appends are not atomic. Replay is IDEMPOTENT for the
  * curated corpus' content semantics (a replayed batch's survivors
  * anti-join against an index that may already contain them — they
  * are filtered, nothing duplicates — unless the crash happened
  * between the two appends, the window a table format with
  * multi-table transactions closes in production). The index read
  * dedups digests defensively, so a torn index append degrades
  * storage, never correctness of subsequent filtering.
  *
  * Scale shape: gate/dedup are map-side + one 16-byte-key shuffle per
  * batch (q78's rule); the index probe is a join keyed on the digest —
  * at rest the index is bucketed by digest prefix so a batch of B
  * rows probes it without scanning history (q85's posture).
  */
object DocStream {

  /** One micro-batch of the curation transaction — factored out so the
    * batch semantics are testable without a streaming harness.
    */
  private[streaming] def curateBatch(
      batch: DataFrame, curatedDir: String, indexDir: String): Unit = {
    val spark = batch.sparkSession
    val gated = TextPipeline.gate(batch)
    val unique = TextPipeline.dedup(gated).withColumn("h", md5(col("text")))
    val fresh = unique.join(readIndex(spark, indexDir), Seq("h"), "left_anti")
      .localCheckpoint() // evaluate the probe BEFORE the index append below changes what it reads
    fresh.drop("h").write.mode("append").parquet(curatedDir)
    fresh.select("h").write.mode("append").parquet(indexDir)
  }

  /** The digest index, or an empty frame before the first batch lands.
    * Digests are distinct-ed on read: a replayed/torn append may hold
    * duplicates, which must not multiply anti-join probes downstream.
    */
  private def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.parquet(indexDir).select("h").distinct()
    else {
      import spark.implicits._
      Seq.empty[String].toDF("h")
    }
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, curatedDir, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
