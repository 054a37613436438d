package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Crash drill for the compaction swap (the StagedCommitDrillSpec
  * discipline applied at the layout grain): the staged output is
  * written completely before any live file is touched, so EVERY crash
  * window must re-converge on the next compaction call — including
  * the windows where the grain's live files are partially or wholly
  * deleted, which a delete-then-rename swap would turn into silent
  * permanent row loss.
  */
class SegmentsRecoverySpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  private final class InjectedCrash extends RuntimeException("injected crash")

  private def killAt(step: String)(body: => Unit): Unit = {
    Segments.failpoint = s => if (s.startsWith(step)) throw new InjectedCrash
    try intercept[InjectedCrash](body)
    finally Segments.failpoint = _ => ()
  }

  private def freshLog(): (String, Seq[(Long, Long)]) = {
    val root = s"${tempCorpusDir("graft_seg_rec")}/log"
    val rows = (0 until 2000).map(i => (i.toLong, i.toLong * 1000L))
    val df = rows.toDF("k", "ts")
    // Two overlapping segments → every range holds 2 files.
    df.filter(col("k") % 2 === 0)
      .repartitionByRange(2, col("ts")).sortWithinPartitions("ts")
      .write.mode("append").parquet(root)
    df.filter(col("k") % 2 === 1)
      .repartitionByRange(2, col("ts")).sortWithinPartitions("ts")
      .write.mode("append").parquet(root)
    (root, rows)
  }

  private def canon(root: String): Seq[(Long, Long)] =
    spark.read.parquet(root).as[(Long, Long)].collect().toSeq.sorted

  test("a kill in any swap window re-converges on the next compaction call") {
    Seq("staged", "deleted", "renamed").foreach { window =>
      val (root, rows) = freshLog()
      killAt(s"$window:") {
        Segments.compactSortedRange(spark, root, "ts", 0L, 3000000L)
      }
      // The recovery call must restore the exact multiset and leave
      // the grain compacted.
      Segments.compactSortedRange(spark, root, "ts", 0L, 3000000L)
      assert(canon(root) == rows.sorted,
        s"window '$window': rows lost or duplicated after recovery")
      // Compact now: a further call is a no-op on the file set.
      val files = spark.read.parquet(root).inputFiles.toSet
      Segments.compactSortedRange(spark, root, "ts", 0L, 3000000L)
      assert(spark.read.parquet(root).inputFiles.toSet == files,
        s"window '$window': recovery left the grain un-compacted")
    }
  }

  test("an incomplete staged write (no _SUCCESS) is discarded and the live grain survives") {
    val (root, rows) = freshLog()
    // Fake a crash DURING the staged write: a tmp dir with a part file
    // but no _SUCCESS marker.
    val tmp = java.nio.file.Paths.get(root, ".compact-0-3000000")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-00000-bogus.parquet"), Array[Byte](1, 2, 3))
    Segments.compactSortedRange(spark, root, "ts", 0L, 3000000L)
    assert(canon(root) == rows.sorted, "incomplete stage corrupted the grain")
    assert(!java.nio.file.Files.exists(tmp), "incomplete stage not cleaned up")
  }

  test("bucket compaction recovers through the deleted window too") {
    val tag = System.nanoTime()
    val t = s"graft_rec_bkt_$tag"
    val df = (0 until 1000).map(i => (i.toLong, i.toString)).toDF("k", "v")
    Segments.appendBucketed(df.filter(col("k") % 2 === 0), t, "k", 4)
    Segments.appendBucketed(df.filter(col("k") % 2 === 1), t, "k", 4)
    killAt("deleted:") { Segments.compactBucket(spark, t, "k", 2) }
    Segments.compactBucket(spark, t, "k", 2)
    assert(spark.table(t).count() == 1000, "bucket rows lost after crash recovery")
    // The recovered replacement still maps to bucket 2: the co-located
    // read path groups it correctly (a wrong name suffix would change
    // the table's row count per bucket and break keyed joins).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table(t).join(df.withColumnRenamed("v", "v2")
        .repartition(4, col("k")), Seq("k"))
      assert(j.count() == 1000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("a torn bucket is healed by maintenance on a DIFFERENT bucket") {
    val t = s"graft_rec_bkt_x_${System.nanoTime()}"
    val df = (0 until 1000).map(i => (i.toLong, i.toString)).toDF("k", "v")
    Segments.appendBucketed(df.filter(col("k") % 2 === 0), t, "k", 4)
    Segments.appendBucketed(df.filter(col("k") % 2 === 1), t, "k", 4)
    // Bucket 2's swap dies in the worst window: its live files are
    // gone, the staged replacement not yet installed.
    killAt("deleted:") { Segments.compactBucket(spark, t, "k", 2) }
    assert(spark.table(t).count() < 1000, "drill setup: crash left no gap")
    // Compacting bucket 0 — a different grain — must sweep and heal
    // bucket 2 too: readers between the crash and a lucky same-id
    // retry would otherwise silently miss bucket 2's rows.
    Segments.compactBucket(spark, t, "k", 0)
    assert(spark.table(t).count() == 1000,
      "cross-bucket sweep did not heal the torn bucket")
  }

  test("a torn bucket is healed by the next append") {
    val t = s"graft_rec_bkt_a_${System.nanoTime()}"
    val df = (0 until 1000).map(i => (i.toLong, i.toString)).toDF("k", "v")
    Segments.appendBucketed(df.filter(col("k") % 2 === 0), t, "k", 4)
    Segments.appendBucketed(df.filter(col("k") % 2 === 1), t, "k", 4)
    killAt("deleted:") { Segments.compactBucket(spark, t, "k", 2) }
    // The next ingest tick heals the torn grain BEFORE adding its own
    // files (an append into the crash window would be superseded by
    // the staged install — the single-writer contract's one hazard).
    val batch = (1000 until 1200).map(i => (i.toLong, i.toString)).toDF("k", "v")
    Segments.appendBucketed(batch, t, "k", 4)
    assert(spark.table(t).count() == 1200,
      "append-entry sweep did not heal the torn bucket")
    assert(spark.table(t).groupBy().agg(countDistinct("k")).head().getLong(0) == 1200)
  }
}
