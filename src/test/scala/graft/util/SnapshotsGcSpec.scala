package graft.util

import java.nio.file.Files

import graft.SparkTestBase

/** Disposal end of the artifact lifecycle: when a corpus dir is
  * rewritten, the previous generation's snapshots (parquet dirs +
  * bucketed catalog tables) become unreachable under the new content
  * fingerprint but stay on disk forever. [[Snapshots.gc]] must remove
  * exactly that stale generation — and nothing else: not the current
  * generation, not other corpus dirs' artifacts.
  */
class SnapshotsGcSpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  private def writeCorpus(dir: String, n: Int): Unit =
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")

  test("gc removes exactly the superseded generation's snapshots and tables") {
    val dir = tempCorpusDir("graft_gc")
    writeCorpus(dir, 10)
    def build() = {
      Snapshots(spark, dir, "gc-probe")(spark.read.parquet(s"$dir/t.parquet"))
      Snapshots.bucketedTable(spark, dir, "gc-probe-b", "k", 2)(
        spark.read.parquet(s"$dir/t.parquet"))
    }
    build()
    // Nothing stale yet: gc on a single-generation corpus is a no-op.
    assert(Snapshots.gc(spark, dir).isEmpty, "gc removed something from a fresh corpus")

    // A bystander tmp entry that merely shares the name shape must
    // survive (it belongs to a different corpus-dir hash).
    val bystander = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-snap-000000000000-fff-bystander")
    Files.createDirectories(bystander)

    // The corpus is rewritten → new fingerprint → generation 2 builds.
    writeCorpus(dir, 25)
    build()
    val removed = Snapshots.gc(spark, dir)
    val removedPaths = removed.collect { case s if s.startsWith("path:") => s.stripPrefix("path:") }
    val removedTables = removed.collect { case s if s.startsWith("table:") => s.stripPrefix("table:") }
    assert(removedPaths.nonEmpty, s"gen-1 snapshot dir not collected: $removed")
    assert(removedTables.nonEmpty, s"gen-1 bucketed table not collected: $removed")
    removedPaths.foreach { p =>
      assert(!new java.io.File(new java.net.URI(p).getPath).exists
        || !p.startsWith("file:"), s"removed path still on disk: $p")
    }
    removedTables.foreach { t =>
      assert(!spark.catalog.tableExists(t), s"removed table still cataloged: $t")
    }
    assert(Files.exists(bystander), "gc deleted another corpus dir's artifact")
    Files.deleteIfExists(bystander)

    // The CURRENT generation survived: the memoized snapshot serves
    // without rebuilding (a throwing builder proves the memo is warm)
    // and holds generation-2 content.
    val probe = Snapshots(spark, dir, "gc-probe")(sys.error("gen-2 memo must be warm"))
    assert(probe.count() == 25, "gc damaged the current generation")
    assert(Snapshots.bucketedTable(spark, dir, "gc-probe-b", "k", 2)(
      sys.error("gen-2 bucketed memo must be warm")).count() == 25)
    // And a second gc finds nothing left to do.
    assert(Snapshots.gc(spark, dir).isEmpty, "gc is not idempotent")
  }

  test("rebuild writes a new generation: pinned readers keep their files; gc collects the old one") {
    val dir = tempCorpusDir("graft_gc_gen")
    writeCorpus(dir, 10)
    val v1 = Snapshots(spark, dir, "gen-probe")(spark.read.parquet(s"$dir/t.parquet"))
    val v1Files = v1.inputFiles.toSeq
    assert(v1.count() == 10)
    // Refresh (the quantizer-retrain shape): the corpus is UNCHANGED —
    // same fingerprint — but the artifact is re-derived. The rebuild
    // must not overwrite v1's path in place: `v1` is a pinned reader.
    val v2 = Snapshots.rebuild(spark, dir, "gen-probe")(
      spark.read.parquet(s"$dir/t.parquet").filter($"k" <= 5))
    assert(v2.count() == 5)
    assert(v2.inputFiles.toSeq.intersect(v1Files).isEmpty,
      "rebuild reused the old generation's files")
    assert(v1.count() == 10,
      "rebuild deleted files a pinned reader references")
    // The memo serves the refreshed generation from now on.
    assert(Snapshots(spark, dir, "gen-probe")(
      sys.error("memo must be warm")).count() == 5)
    // gc collects the superseded base generation, keeps the current.
    val removed = Snapshots.gc(spark, dir)
    assert(removed.exists(_.contains("gen-probe")),
      s"superseded base generation not collected: $removed")
    assert(Snapshots(spark, dir, "gen-probe")(
      sys.error("memo must still be warm")).count() == 5,
      "gc damaged the live rebuilt generation")
    assert(Snapshots.gc(spark, dir).isEmpty, "gen gc is not idempotent")
  }
}
