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

  /** The 20k-row fixtures pass an explicit rows target so the derived
    * fan-out ([[graft.util.ManifestLog.sourceFanout]]) yields a
    * multi-file layout the pruning assertions can bite on — under the
    * production targets (256 MB / 256k rows) a toy corpus is correctly
    * one file, which proves nothing about admission.
    */
  private val FixtureTargetRows = 2000L

  test("q152's lookup answers exactly and plans O(1) files, not the population") {
    val dir = tempCorpusDir("graft_byuser")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir,
      targetFileRows = FixtureTargetRows)
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
    val root = Events.eventsByUserLog(spark, dir,
      targetFileRows = FixtureTargetRows)
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

  test("the depth tick: manifest-parse no-op under the bound, mass-bounded fold past it") {
    val dir = tempCorpusDir("graft_byuser_tick")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir,
      targetFileRows = FixtureTargetRows)
    (1L to 3L).foreach(t => Events.appendEventsByUserSegment(spark, root, batch(t)))
    val allBefore = ManifestLog.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq
    // Depth = 1 history + 3 segments = 4: under the default bound the
    // tick must commit nothing (it would be O(layout) every tick).
    assert(!Events.maintainEventsByUser(spark, root),
      "tick folded below the read-amplification bound")
    // Past the bound: fold back to range-disjoint files whose count is
    // DERIVED from mass (20,600 rows / 2,000-row target = 11), so the
    // file a probe admits stays bounded by the target — never a
    // monolith, never a partition-count pin that lets per-file mass
    // grow with the layout. Every row survives and the point lookup is
    // O(1) files again.
    assert(Events.maintainEventsByUser(spark, root, maxDepth = 2,
      targetFileRows = FixtureTargetRows))
    val expectFiles = ((allBefore.size + FixtureTargetRows - 1) /
      FixtureTargetRows).toInt
    assert(ManifestLog.liveFileCount(spark, root) == expectFiles,
      s"fold must restore ceil(rows/target)=$expectFiles range-disjoint " +
        s"files, got ${ManifestLog.liveFileCount(spark, root)}")
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

  test("the fold is range-sharded: only the over-depth key slice rewrites, settled ranges pass by reference") {
    // The 100 TB write-amplification contract (r19 verdict item 1):
    // when the stacked segments cover only a SLICE of key space — a
    // hot-key burst, a backfill, post-delete churn — the fold must
    // rewrite that slice's overlap-connected component alone. Settled
    // files outside it pass to the new generation by reference (same
    // path, untouched bytes), a reader pinned pre-fold keeps
    // answering, and fold cost tracks the over-depth share, not the
    // layout.
    val dir = tempCorpusDir("graft_byuser_shard")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir,
      targetFileRows = FixtureTargetRows)
    val settled = ManifestLog.read(spark, root).inputFiles.toSet
    assert(settled.size >= 8, s"fixture too small: ${settled.size} files")
    // Three narrow batches over users [0, 25) only — they overlap the
    // first settled file's range and nothing else.
    def narrow(tag: Long) = spark.range(200L).toDF("i")
      .select(
        col("i") % 25 as "user_id",
        lit(BaseUs) + lit(40000000000L) + lit(tag) * 1000000000L + col("i") as "ts_us",
        lit(900000L) + lit(tag) * 1000L + col("i") as "event_id",
        lit("click") as "event_type")
    (1L to 3L).foreach(t =>
      Events.appendEventsByUserSegment(spark, root, narrow(t)))
    val allBefore = ManifestLog.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq
    val pinned = ManifestLog.read(spark, root) // pre-fold generation
    // Depth in the narrow slice = 1 settled + 3 segments = 4 > 2; the
    // rest of key space sits at depth 1.
    assert(Events.maintainEventsByUser(spark, root, maxDepth = 2,
      targetFileRows = FixtureTargetRows))
    val after = ManifestLog.read(spark, root).inputFiles.toSet
    val untouched = settled.intersect(after)
    assert(settled.size - untouched.size <= 2,
      s"fold rewrote ${settled.size - untouched.size} settled files — " +
        "only the over-depth component (1-2 files) may fold")
    assert(untouched.size < settled.size,
      "fold rewrote nothing — the over-depth slice must fold")
    val allAfter = ManifestLog.read(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(allAfter == allBefore, "sharded fold lost or duplicated rows")
    // Read amplification restored inside the folded slice…
    val hot = ManifestLog.readKeyed(spark, root, "user_id", Seq(3L))
    assert(hot.inputFiles.length <= 2,
      s"post-fold lookup in the folded slice planned ${hot.inputFiles.length}")
    // …within-user time order preserved through the sharded rewrite…
    val ts = hot.select("ts_us").as[Long].collect().toSeq
    assert(ts == ts.sorted, "sharded fold dropped the within-user order")
    // …an untouched range still answers from its original file…
    val cold = ManifestLog.readKeyed(spark, root, "user_id", Seq(400L))
    assert(cold.inputFiles.toSet.subsetOf(untouched),
      "a lookup outside the folded slice read a rewritten file")
    assert(cold.count() == 40L)
    // …and the pre-fold pinned reader still answers in full (retired
    // files stay on disk for pinned generations until vacuum).
    assert(pinned.count() == allBefore.size.toLong,
      "the fold broke a reader pinned at the pre-fold generation")
  }

  test("forget-a-user rewrites only the files that can hold the user") {
    // The replica's second motivating operation (the first is the
    // point fetch): a right-to-be-forgotten order against a key-
    // clustered layout must cost O(files whose user range can hold the
    // keys) — deleteKeys' stats-exact candidate pruning — never a
    // layout rewrite.
    val dir = tempCorpusDir("graft_byuser_forget")
    writeCorpus(dir)
    val root = Events.eventsByUserLog(spark, dir,
      targetFileRows = FixtureTargetRows)
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
