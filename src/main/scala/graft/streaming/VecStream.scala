package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.VectorFunctions.l2Norm

/** Streaming vector ingest against a FROZEN quantizer — the streaming
  * twin of q112's incremental ANN "add" path, completing the index
  * lifecycle: batch build (prepareIndexes) → batch add (q112) →
  * streaming add (this). Vectors arrive as parquet drops; each
  * micro-batch dedups exact-duplicate embeddings WITHIN the batch
  * (canonical lowest vec_id), anti-joins the at-rest content-digest
  * index so re-delivered vectors are never re-indexed, assigns the
  * fresh remainder to the frozen centroid table (map-side broadcast
  * argmax — the batch never re-clusters history), and appends
  * (vec_id, cluster) to the live assignment table plus digests to the
  * index.
  *
  * Exactly-once across the two tables uses [[StagedCommit]]'s staged,
  * batch-stamped, marker-committed publish — the same transaction
  * [[DocStream]] runs for documents, proven by the torn-replay specs.
  *
  * Scale shape: dedup and the index probe are digest-keyed (16-byte
  * shuffle keys, q85's posture); assignment is one map-side pass
  * against the broadcast centroids (cells ≤ MaxNList by construction);
  * nothing in the batch path scans the at-rest assignment.
  */
object VecStream {

  /** Content digest of an embedding: md5 over the comma-joined float
    * renderings. Only self-consistency within the stream matters (the
    * digest never crosses engines), and Spark's float→string rendering
    * is deterministic.
    */
  private def embDigest(emb: org.apache.spark.sql.Column) =
    md5(array_join(transform(emb, _.cast("string")), ","))

  /** One micro-batch of the ingest transaction — factored out so the
    * batch semantics (including crash replay) are testable without a
    * streaming harness. `centroidsDir` holds the frozen quantizer
    * (cid, c_emb, c_nrm) — e.g. the ivf-half-centroids artifact.
    */
  private[streaming] def ingestBatch(
      batch: DataFrame, batchId: Long,
      centroidsDir: String, assignedDir: String, indexDir: String): Unit = {
    import StagedCommit._
    val spark = batch.sparkSession
    val fs = new Path(assignedDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = commitMarker(indexDir, batchId)
    if (fs.exists(marker)) return // fully committed — replay is a no-op
    deleteStamped(fs, assignedDir, batchId)
    deleteStamped(fs, indexDir, batchId)

    val keyed = batch
      .select(col("vec_id"), col("embedding"))
      .withColumn("h", embDigest(col("embedding")))
    // Within-batch exact dedup: lowest vec_id per content digest.
    val byDigest = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy("vec_id")
    val unique = keyed
      .withColumn("rk", row_number().over(byDigest))
      .filter(col("rk") === 1).drop("rk")
    val fresh = unique
      .join(readDigestIndex(spark, indexDir), Seq("h"), "left_anti")
      .localCheckpoint() // evaluate the probe before the appends change what it reads

    val cents = spark.read.parquet(centroidsDir)
    val assigned = graft.queries.Similarity
      .bestCluster(fresh.withColumn("nrm", l2Norm(col("embedding"))), cents)

    val asgStage = s"$assignedDir/.staging-$batchId"
    val idxStage = s"$indexDir/.staging-$batchId"
    assigned.write.mode("overwrite").parquet(asgStage)
    fresh.select("h").write.mode("overwrite").parquet(idxStage)
    publishStaged(fs, asgStage, assignedDir, batchId)
    publishStaged(fs, idxStage, indexDir, batchId)
    commit(fs, indexDir, batchId) // commit point: marker present ⇔ both tables hold the batch
  }

  /** Watch `srcDir` for embedding parquet drops and run the ingest
    * transaction per micro-batch.
    */
  def runIngestStream(
      spark: SparkSession, srcDir: String, centroidsDir: String,
      assignedDir: String, indexDir: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, centroidsDir, assignedDir, indexDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
