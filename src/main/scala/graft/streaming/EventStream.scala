package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Structured Streaming surface — the incremental twins of the batch
  * event queries in graft.queries.Events (SURVEY.md §2.11: the
  * reference has no streaming; this is the north-star extension).
  *
  * Each transform takes a streaming OR batch DataFrame with the events
  * schema (ts timestamp, user_id long, event_type string, value double,
  * event_id long) — the same plan runs in both modes, which is how the
  * batch oracle validates the streaming semantics.
  *
  * Watermarks bound state: an aggregation over event-time windows keeps
  * per-window state until watermark passes window end; at 100 TB/day
  * the state store only ever holds (windows in watermark horizon ×
  * groups), not history.
  */
object EventStream {

  /** Tumbling 1-hour counts per event type, 1-hour watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"),
      )

  /** Per-user session aggregation via session_window (30-minute gap) —
    * the operator Structured Streaming implements with its sessionizing
    * state store; identical semantics to the q52 batch/oracle query.
    */
  def sessionAggregates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"), col("sum_value"),
      )

  /** Streaming exact dedup on event_id: state bounded by the watermark
    * horizon (late duplicates beyond it are dropped by definition).
    */
  def dedupe(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id", "ts")

  /** File-source incremental pipeline: watch a directory of parquet
    * drops, maintain tumbling aggregates, append to parquet. The
    * checkpoint makes it exactly-once per output epoch.
    */
  def runFileStream(spark: org.apache.spark.sql.SparkSession,
                    srcDir: String, outDir: String, checkpointDir: String,
                    schema: org.apache.spark.sql.types.StructType): StreamingQuery =
    tumblingCounts(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
}
