package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.ManifestLog

/** The user-key-clustered events replica behind q152 — the layout
  * answer to the r18-measured honest negative (a TIME-sorted log
  * probed on user ids admits every file at every corpus size). Three
  * contracts: point lookups plan O(1) files from manifest range stats
  * while answering exactly the unpruned filter; appended segments stay
  * readable with admission bounded by SEGMENT count, not corpus size;
  * and the depth-triggered maintenance tick is a manifest parse while
  * read amplification is bounded, folding the stack back into n
  * range-disjoint files once it is not.
  */
class ByUserLogSpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  /** 20k events over 500 users, two rows per (user, k) wave — written
    * in EVENT-TIME order, like a real producer, so user ids arrive
    * maximally interleaved and only the replica's own clustering can
    * explain any pruning.
    */
  private def writeCorpus(dir: String): Unit =
    spark.range(20000L).toDF("event_id")
      .withColumn("user_id", col("event_id") % 500)
      .withColumn("event_type",
        when(col("event_id") % 3 === 0, "click").otherwise("view"))
      .withColumn("value", (col("event_id") % 11).cast("double"))
      .withColumn("ts",
        timestamp_micros(lit(BaseUs) + col("event_id") * 1000000L)
          .cast("timestamp_ntz"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")

  /** A 200-row arriving batch in the normalized eventsUs shape: new
    * events for every 25th user (probed user 0 included), ids and
    * times past the at-rest corpus.
    */
  private def batch(tag: Long): org.apache.spark.sql.DataFrame =
    spark.range(200L).toDF("i")
      .select(
        (col("i") * 25) % 500 as "user_id",
        lit(BaseUs) + lit(30000000000L) + lit(tag) * 1000000000L + col("i") as "ts_us",
        lit(100000L) + lit(tag) * 1000L + col("i") as "event_id",
        lit("click") as "event_type")

  test("q152's lookup answers exactly and plans O(1) files, not the population") {
    val dir = tempCorpusDir("graft_byuser")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir)
    val total = ManifestLog.liveFileCount(spark, root)
    assert(total >= 4, s"fixture too small to prove pruning: $total files")
    val keys = Seq(3L, 7L, 11L)
    val got = ManifestLog.readKeyed(spark, root, "user_id", keys)
    assert(got.inputFiles.length <= 2 && got.inputFiles.length < total,
      s"expected O(1) admission, planned ${got.inputFiles.length} of $total")
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id").isin(keys: _*))
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(expected.nonEmpty)
    assert(got.select("user_id", "ts_us", "event_id", "event_type")
      .as[(Long, Long, Long, String)].collect().toSeq.sorted == expected,
      "pruned read diverged from the unpruned filter")
  }

  test("appended segments stay readable; admission grows with segments, not corpus") {
    val dir = tempCorpusDir("graft_byuser_seg")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir)
    val before = ManifestLog.liveFileCount(spark, root)
    Events.appendEventsByUserSegment(spark, root, batch(1L))
    assert(ManifestLog.liveFileCount(spark, root) == before + 1,
      "a key-domain-spanning batch must land as ONE segment file")
    val got = ManifestLog.readKeyed(spark, root, "user_id", Seq(0L))
    // 1 history file + 1 segment: the segment spans the domain, so it
    // admits for every key — bounded by segment count, never corpus.
    assert(got.inputFiles.length <= 2,
      s"admission must be history+segments, planned ${got.inputFiles.length}")
    val rows = got.select("event_id").as[Long].collect().toSet
    assert(rows.contains(0L) && rows.contains(101000L),
      "lookup must see both at-rest history and the appended segment")
  }

  test("the depth tick: manifest-parse no-op under the bound, n-file fold past it") {
    val dir = tempCorpusDir("graft_byuser_tick")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir)
    (1L to 3L).foreach(t => Events.appendEventsByUserSegment(spark, root, batch(t)))
    val allBefore = ManifestLog.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq
    // Depth = 1 history + 3 segments = 4: under the default bound the
    // tick must commit nothing (it would be O(layout) every tick).
    assert(!Events.maintainEventsByUser(spark, root),
      "tick folded below the read-amplification bound")
    // Past the bound: fold back to n range-disjoint files; every row
    // survives and the point lookup is O(1) files again.
    assert(Events.maintainEventsByUser(spark, root, maxDepth = 2))
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(ManifestLog.liveFileCount(spark, root) == n,
      "fold must restore the n-file range-disjoint layout, not a monolith")
    val allAfter = ManifestLog.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(allAfter == allBefore, "fold lost or duplicated rows")
    val got = ManifestLog.readKeyed(spark, root, "user_id", Seq(0L))
    assert(got.inputFiles.length <= 2,
      s"post-fold lookup should be O(1) files, planned ${got.inputFiles.length}")
    // The fold preserved the layout's documented within-user time
    // order (secondarySort threads (user_id, ts_us) through the
    // rewrite): the admitted file reads user 0's history in ts order.
    val ts = got.select("ts_us").as[Long].collect().toSeq
    assert(ts == ts.sorted,
      "fold dropped the within-user time order the layout documents")
  }

  test("forget-a-user rewrites only the files that can hold the user") {
    // The replica's second motivating operation (the first is the
    // point fetch): a right-to-be-forgotten order against a key-
    // clustered layout must cost O(files whose user range can hold the
    // keys) — deleteKeys' stats-exact candidate pruning — never a
    // layout rewrite.
    val dir = tempCorpusDir("graft_byuser_forget")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir)
    val totalFiles = ManifestLog.liveFileCount(spark, root)
    val before = ManifestLog.read(spark, root).count()
    val victims = Seq(3L, 7L).toDF("user_id")
    val res = ManifestLog.deleteKeys(spark, root, "user_id", victims,
      boundCol = Some("user_id"))
    assert(res.filesRewritten + res.filesRetired <= 2
        && res.filesRewritten + res.filesRetired < totalFiles,
      s"forget touched ${res.filesRewritten + res.filesRetired} of $totalFiles files")
    assert(res.rowsDeleted == 80L, // 20k rows / 500 users = 40 each
      s"expected the two users' 80 rows gone, got ${res.rowsDeleted}")
    val after = ManifestLog.read(spark, root)
    assert(after.count() == before - 80L)
    assert(after.filter(col("user_id").isin(3L, 7L)).count() == 0L)
    // The lookup path agrees: probed-and-forgotten keys answer zero
    // rows, a surviving neighbor still answers in full.
    assert(ManifestLog.readKeyed(spark, root, "user_id", Seq(3L, 7L)).count() == 0L)
    assert(ManifestLog.readKeyed(spark, root, "user_id", Seq(11L)).count() == 40L)
  }
}
