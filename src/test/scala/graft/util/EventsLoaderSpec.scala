package graft.util

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkTestBase

/** Encoding contract of the events loader. The corpus's `ts` encoding
  * has ALREADY drifted once in production (the driver regenerated the
  * fixture ns→µs between rounds 8 and 9, and the then-hard-coded nanos
  * rebuild turned 20 queries and 12 tests red from one line) — this
  * suite writes the SAME logical events in every encoding the loader
  * claims to support and proves:
  *   1. [[Tables.events]] canonicalizes all of them to the identical
  *      micros-TimestampType frame;
  *   2. the incremental boundary path
  *      ([[graft.queries.Events.eventsUsSince]]) selects identical rows
  *      AND still pushes the cutoff into the parquet scan as a
  *      row-group filter in every encoding — adaptivity that silently
  *      dropped pruning would "work" at sf0.01 and melt on 100 TB.
  *
  * The nanos case is written as a plain BIGINT column: under
  * [[Tables.sessionConf]]'s `nanosAsLong` a TIMESTAMP(NANOS) file
  * READS as exactly that Spark type (LongType), and the loader branches
  * on the observed type — so a long column exercises the identical
  * code path without needing a writer for the nanos logical type
  * (which Spark cannot produce).
  */
class EventsLoaderSpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  // (event_id, user_id, event_type, ts_us) — sub-second micros that are
  // NOT millisecond-round, so a lossy ms-path would be caught.
  private val rows = Seq(
    (1L, 101L, "click", 1700000000000001L),
    (2L, 102L, "view", 1700000003500123L),
    (3L, 101L, "purchase", 1700000007999999L),
    (4L, 103L, "click", 1700000012345678L),
    (5L, 102L, "view", 1700000019999999L),
  )

  private def base: DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "ts_us")
      .withColumn("value", col("event_id") * 1.5)
      .withColumn("props", lit("""{"k":"v"}"""))

  /** One corpus dir per encoding, same logical instants. The ns rows
    * carry +999 trailing nanos: truncation (`div 1000`) must agree with
    * the µs files, and the boundary filter's ts ≥ c·1000 ⟺
    * trunc(ts) ≥ c claim is only non-trivial with sub-µs residue.
    */
  private lazy val dirs: Map[String, String] = Seq(
    "ns-long" -> ((d: DataFrame) => d.withColumn("ts", col("ts_us") * 1000L + 999L)),
    "us-ntz" -> ((d: DataFrame) =>
      d.withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))),
    "us-utc" -> ((d: DataFrame) => d.withColumn("ts", timestamp_micros(col("ts_us")))),
  ).map { case (name, encode) =>
    val dir = tempCorpusDir(s"graft_events_$name")
    encode(base)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    name -> dir
  }.toMap

  private def tsUsOf(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)].collect().toSeq.sorted

  test("Tables.events canonicalizes every encoding to the same micros TimestampType") {
    val expected = rows.map(r => (r._1, r._4)).sorted
    for ((name, dir) <- dirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType, s"$name: ${ev.schema("ts")}")
      assert(tsUsOf(ev) == expected, s"$name: micros drifted from the logical instants")
    }
  }

  test("eventsUsSince: identical rows in every encoding, boundary pushed to the log scan") {
    // Cutoff exactly AT row 3's micros: pins ≥-inclusivity, and in the
    // ns encoding that row sits at cutoff·1000 + 999 — the truncation ⟺
    // boundary equivalence at its tightest.
    val cutoff = 1700000007999999L
    val expected = rows.filter(_._4 >= cutoff).map(r => (r._2, r._4, r._1, r._3)).sorted
    for ((name, dir) <- dirs) {
      val since = graft.queries.Events.eventsUsSince(spark, dir, cutoff)
      val got = since.as[(Long, Long, Long, String)].collect().toSeq.sorted
      assert(got == expected, s"$name: since-filter selected wrong rows")
      // The boundary is a BIGINT comparison against the at-rest sorted
      // log — the one timestamp-predicate form Spark's parquet filter
      // conversion handles in every encoding and every version.
      val plan = since.queryExecution.executedPlan.toString
      val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
      assert(pushed.contains("GreaterThanOrEqual(ts_us"),
        s"$name: cutoff not pushed into the log scan:\n$plan")
    }
  }

  test("the boundary literal actually prunes row groups, not just parses as pushed") {
    // "PushedFilters" in the plan proves the source ACCEPTED the
    // predicate; this proves it PRUNES. It cannot be taken on faith:
    // measured on this exact Spark, a boundary filter on a raw
    // TIMESTAMP_NTZ column is accepted yet NEVER becomes a parquet
    // row-group predicate (ParquetFilters only converts UTC-adjusted
    // annotations — the scan decoded all 50k rows when this suite
    // filtered the raw NTZ file directly). The at-rest ts-sorted
    // BIGINT-micros log exists precisely to close that hole: filtered
    // to the last ~20%, the scan must emit far fewer rows than the
    // corpus holds — ≈full-count means the boundary silently stopped
    // pruning (fine at sf0.01, melts on 100 TB).
    val n = 50000L
    val dir = tempCorpusDir("graft_events_rg")
    spark.range(n).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) + col("event_id") * 1000000L)
        .cast("timestamp_ntz"))
      .withColumn("user_id", col("event_id") % 97)
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .parquet(s"$dir/events.parquet")
    val cutoff = 1700000000000000L + (n * 8 / 10) * 1000000L
    val qe = graft.queries.Events.eventsUsSince(spark, dir, cutoff).queryExecution
    // Drive THIS plan instance so its metrics accumulate (a fresh
    // count() would execute a different plan object).
    assert(qe.executedPlan.execute().count() == n / 5)
    val scanRows = qe.executedPlan.collectLeaves()
      .map(_.metrics("numOutputRows").value).sum
    assert(scanRows < n / 2,
      s"scan emitted $scanRows of $n rows — the boundary literal is not pruning row groups")
  }

  test("an unsupported ts encoding fails loudly, not by misreading time") {
    val dir = tempCorpusDir("graft_events_bad")
    base.withColumn("ts", col("ts_us").cast("string"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported"), e.getMessage)
  }

  test("a plain BIGINT ts holding MICROS fails loudly instead of shifting ×1000") {
    // The physical schema cannot distinguish BIGINT nanos from BIGINT
    // micros — both read as LongType — and the nanos branch's div 1000
    // would silently move every instant three orders of magnitude. The
    // loader's footer guard must reject the micros magnitudes (~1.7e15,
    // three decades below any sane epoch-nanos value) rather than guess.
    val dir = tempCorpusDir("graft_events_uslong")
    base.withColumn("ts", col("ts_us"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("not plausibly epoch NANOS"), e.getMessage)
  }
}
