package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Vacuum's writer-safety grace window and the unbounded-slice
  * sentinel — the two multi-writer/boundary seams of the manifest
  * layer's disposal and planning paths.
  *
  * The race the grace window closes: an in-flight append stages files,
  * renames them into the root, and only THEN commits the manifest that
  * references them. Between the rename and the commit the files are
  * indistinguishable from crash orphans by reference-counting alone —
  * a `graceMs = 0` vacuum (the quiesced-writers contract) deletes
  * them, and the append then commits a manifest listing missing files.
  * With `graceMs` above the stage→commit latency, vacuum skips
  * anything younger than the window (the Delta VACUUM retention
  * pattern) and concurrent appenders are safe.
  */
class VacuumGraceSpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  private val Hour = 3600L * 1000L

  private def freshLog(): String = {
    val root = s"${tempCorpusDir("graft_vgrace")}/log"
    (0L until 100L).map(i => (i, s"d-$i")).toDF("k", "body")
      .coalesce(1).sortWithinPartitions("k").write.parquet(root)
    ManifestLog.adopt(spark, root, Some("k"))
    root
  }

  private def backdate(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, ageMs: Long): Unit =
    fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)

  test("a graced vacuum spares young unreferenced files and stage dirs; an aged pass collects them") {
    val root = freshLog()
    val (p, fs) = ManifestLog.hadoop(spark, root)
    // Fake an in-flight append: a renamed-in data file and a mid-write
    // stage dir, neither referenced by any manifest yet — plus a
    // commit-in-progress manifest temp.
    val orphan = new org.apache.hadoop.fs.Path(p, "part-inflight.parquet")
    Seq((500L, "d-500")).toDF("k", "body").coalesce(1).write
      .parquet(s"$root/.stage-writer")
    val stagedPart = fs.listStatus(new org.apache.hadoop.fs.Path(p, ".stage-writer"))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(stagedPart, orphan) // the rename half of an append
    val stage2 = new org.apache.hadoop.fs.Path(p, ".stage-mid-write")
    fs.mkdirs(stage2)
    val tmpManifest = new org.apache.hadoop.fs.Path(
      ManifestLog.manifestDir(p), ".tmp-v000000099.manifest")
    fs.create(tmpManifest, true).close()
    // Graced pass: every young artifact of the in-flight append
    // survives (the .stage-writer dir is now empty but still young).
    val deleted = ManifestLog.vacuum(spark, root, keepLast = 1, graceMs = Hour)
    assert(deleted.isEmpty,
      s"graced vacuum deleted a young in-flight writer's work: $deleted")
    assert(fs.exists(orphan) && fs.exists(stage2) && fs.exists(tmpManifest))
    // Age everything past the window: now they are genuine leftovers.
    backdate(fs, orphan, 2 * Hour)
    backdate(fs, stage2, 2 * Hour)
    backdate(fs, new org.apache.hadoop.fs.Path(p, ".stage-writer"), 2 * Hour)
    backdate(fs, tmpManifest, 2 * Hour)
    val collected = ManifestLog.vacuum(spark, root, keepLast = 1, graceMs = Hour)
    assert(collected.toSet == Set("part-inflight.parquet", ".stage-mid-write",
      ".stage-writer", "_manifests/.tmp-v000000099.manifest"),
      s"aged pass collected $collected")
    assert(!fs.exists(orphan) && !fs.exists(stage2) && !fs.exists(tmpManifest))
    // The live layout was never touched.
    assert(ManifestLog.read(spark, root).count() == 100L)
  }

  test("graceMs = 0 keeps the historical quiesced-writers contract: everything unreferenced goes now") {
    val root = freshLog()
    val (p, fs) = ManifestLog.hadoop(spark, root)
    fs.create(new org.apache.hadoop.fs.Path(p, "orphan.parquet"), true).close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, ".stage-x"))
    val deleted = ManifestLog.vacuum(spark, root)
    assert(deleted.toSet == Set("orphan.parquet", ".stage-x"))
  }

  test("retired-but-young files also ride the grace window — disposal defers, audit reads keep working") {
    val root = freshLog()
    ManifestLog.appendSorted(
      Seq((200L, "d-200")).toDF("k", "body").coalesce(1).sortWithinPartitions("k"),
      root, Nil, Some("k"))
    ManifestLog.compactRange(spark, root, "", "k", 0L, 1000L)
    // v1+v2 manifests retire under keepLast=1 (metadata, grace-exempt);
    // their young DATA files survive the graced pass and the pre-
    // compaction generations stay physically intact on disk.
    val graced = ManifestLog.vacuum(spark, root, keepLast = 1, graceMs = Hour)
    assert(graced.forall(d => d.contains("manifest")),
      s"graced vacuum deleted young data files: $graced")
    assert(ManifestLog.read(spark, root).count() == 101L)
  }

  test("the unbounded-slice sentinel: a MaxValue-min file stays admissible when hiExcl means 'no upper edge'") {
    val e = ManifestLog.Entry("f.parquet",
      Seq(("ts_us", Long.MaxValue, Long.MaxValue)))
    // The since-paths encode ">= cutoff, unbounded above" as
    // [cutoff, Long.MaxValue) — a file holding the MaxValue sentinel
    // timestamp satisfies the row filter and must be planned.
    assert(e.mayOverlap("ts_us", 0L, Long.MaxValue))
    assert(e.mayOverlap("ts_us", Long.MaxValue, Long.MaxValue))
    // Bounded slices still prune it.
    assert(!e.mayOverlap("ts_us", 0L, 1000L))
    // And ordinary files are unaffected by the sentinel rule.
    val f = ManifestLog.Entry("g.parquet", Seq(("ts_us", 10L, 20L)))
    assert(f.mayOverlap("ts_us", 15L, Long.MaxValue))
    assert(!f.mayOverlap("ts_us", 21L, Long.MaxValue))
  }
}
