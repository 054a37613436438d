package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkTestBase}

/** Quality-level validation of q115's anomaly gate on a planted event
  * series: a spike an order of magnitude above its trailing baseline
  * must flag, ordinary baseline wiggle must not, and minutes without a
  * full (or non-degenerate) baseline must not appear at all.
  */
class EventsQualitySpec extends SparkTestBase {
  import sqlImplicits._

  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z
  private val MinuteUs = 60L * 1000000L

  test("q115 flags a planted order-of-magnitude spike and nothing else") {
    // Minutes 0..40 of 'click': 10 + (m % 3) events per minute (small
    // deterministic wiggle so no baseline is degenerate), except minute
    // 40 carries 100 events — the spike. Only minutes 30..40 have the
    // full 30-minute baseline, so exactly 11 rows come back.
    val rows = (0 to 40).flatMap { m =>
      val n = if (m == 40) 100 else 10 + m % 3
      (0 until n).map { i =>
        val tsNanos = (BaseUs + m * MinuteUs + i * 100000L) * 1000L
        (m * 1000L + i, m.toLong, "click", tsNanos, 1.0)
      }
    }
    val dir = Files.createTempDirectory("graft_event_anomaly").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("q115_event_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(out.length == 11, s"expected 11 full-baseline minutes, got ${out.length}")
    val spikeMinute = BaseUs + 40 * MinuteUs
    out.foreach { case (minuteUs, n, z, spike) =>
      if (minuteUs == spikeMinute) {
        assert(spike == 1 && z > 3 && n == 100, s"planted spike not flagged: z=$z n=$n")
      } else {
        assert(spike == 0 && math.abs(z) < 3, s"baseline minute $minuteUs flagged: z=$z")
      }
    }
  }
}
