package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestBase

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double, event_id: Long)

/** Structured Streaming semantics checks via MemoryStream: the
  * incremental plans produce the same aggregates as their batch twins
  * (which are themselves DuckDB-oracle-checked in queries.Events).
  */
class EventStreamSpec extends SparkTestBase {
  import sqlImplicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    Ev(t("2024-01-01 00:05:00"), 1, "click", 1.0, 1),
    Ev(t("2024-01-01 00:45:00"), 1, "click", 2.0, 2),
    Ev(t("2024-01-01 01:10:00"), 2, "view", 3.0, 3),
    Ev(t("2024-01-01 01:10:00"), 2, "view", 3.0, 3), // exact duplicate
  )

  test("streaming tumbling counts match the batch plan on the same data") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(batch1: _*)
    val q = EventStream.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling")
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    val batch = EventStream.tumblingCounts(batch1.toDF())
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.map(_._3).sum == 4)
  }

  test("streaming dedup drops exact duplicate events within the watermark") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(batch1: _*)
    val q = EventStream.dedupe(stream.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("deduped").count() == 3)
  }

  test("session aggregation merges events within the 30-minute gap") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(
      Ev(t("2024-01-01 00:00:00"), 7, "click", 1.0, 10),
      Ev(t("2024-01-01 00:20:00"), 7, "click", 1.0, 11), // same session (gap 20m)
      Ev(t("2024-01-01 01:30:00"), 7, "click", 1.0, 12), // new session (gap 70m)
      // advance watermark far enough to emit both sessions
      Ev(t("2024-01-01 05:00:00"), 8, "view", 0.0, 13),
    )
    val q = EventStream.sessionAggregates(stream.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val u7 = spark.table("sessions").filter($"user_id" === 7)
      .orderBy("session_start").collect()
    assert(u7.length == 2)
    assert(u7(0).getAs[Long]("n_events") == 2)
    assert(u7(1).getAs[Long]("n_events") == 1)
  }
}
