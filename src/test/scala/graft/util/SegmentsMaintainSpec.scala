package graft.util

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The self-driving maintenance tick: grains are DERIVED from live
  * file footer ranges (interval components), only over-fragmented
  * components are rewritten, compacted history is never touched, and
  * the tick works identically over bare and manifested roots.
  */
class SegmentsMaintainSpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  private def seg(root: String, lo: Int, hi: Int): Unit =
    (lo until hi).map(i => (i.toLong, i.toLong * 1000L)).toDF("k", "ts")
      .coalesce(1).sortWithinPartitions("ts")
      .write.mode("append").parquet(root)

  test("the tick compacts only the fragmented component and leaves settled history alone") {
    val root = s"${tempCorpusDir("graft_maint")}/log"
    // Settled history: one already-compact file over [2M, 3M).
    seg(root, 2000, 3000)
    val historyFile = spark.read.parquet(root).inputFiles.head
    // A hot ingest range: 5 overlapping segments over [0, 1M).
    (0 until 5).foreach(_ => seg(root, 0, 1000))
    val compacted = Segments.maintainSorted(spark, root, "ts", maxFiles = 3)
    // Exactly one grain compacted, spanning the hot component only.
    assert(compacted == Seq(("", 0L, 999001L)),
      s"unexpected grains: $compacted")
    val files = spark.read.parquet(root).inputFiles
    assert(files.length == 2, s"expected hot-grain file + history file: ${files.toSeq}")
    assert(files.contains(historyFile),
      "the tick rewrote an already-compact history grain")
    // Row fidelity: 5× the hot rows plus history.
    assert(spark.read.parquet(root).count() == 5 * 1000 + 1000)
    // A second tick finds nothing over the bound.
    assert(Segments.maintainSorted(spark, root, "ts", maxFiles = 3).isEmpty)
  }

  test("overlap chaining merges transitive segments into one grain") {
    val root = s"${tempCorpusDir("graft_maint_chain")}/log"
    // Four segments where consecutive ones overlap but the ends do
    // not: [0,500), [400,900), [800,1300), [1200,1700) — one component.
    Seq((0, 500), (400, 900), (800, 1300), (1200, 1700)).foreach {
      case (lo, hi) => seg(root, lo, hi)
    }
    val compacted = Segments.maintainSorted(spark, root, "ts", maxFiles = 3)
    assert(compacted == Seq(("", 0L, 1699001L)), s"got: $compacted")
    assert(spark.read.parquet(root).inputFiles.length == 1)
    assert(spark.read.parquet(root).count() == 500 + 500 + 500 + 500)
  }

  test("the tick composes with a manifested partitioned root, per partition directory") {
    val root = s"${tempCorpusDir("graft_maint_m")}/log"
    def psegDf(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, i.toLong * 1000L, 1990 + (i % 2)))
        .toDF("k", "ts", "year")
        .repartition(1).sortWithinPartitions("ts")
    psegDf(0, 500).write.partitionBy("year").parquet(root)
    ManifestLog.adopt(spark, root)
    (0 until 4).foreach(_ => Segments.appendSorted(psegDf(0, 500), root, Seq("year")))
    val compacted = Segments.maintainSorted(spark, root, "ts", maxFiles = 3)
    assert(compacted.map(_._1).sorted == Seq("year=1990", "year=1991"),
      s"expected one grain per year dir: $compacted")
    val live = ManifestLog.read(spark, root)
    assert(live.inputFiles.length == 2, "each year should hold one compacted file")
    assert(live.count() == 5 * 500)
    // Pre-tick generation still readable (retire-don't-delete).
    assert(ManifestLog.readAt(spark, root, 2L).count() == 2 * 500)
    assert(Segments.maintainSorted(spark, root, "ts", maxFiles = 3).isEmpty)
  }

  test("bucketed tick compacts exactly the over-fragmented buckets") {
    val t = s"graft_maint_bkt_${System.nanoTime()}"
    val df = (0 until 400).map(i => (i.toLong, i.toString)).toDF("k", "v")
    // Four appends leave every bucket at the bound; the fifth tips
    // both over it.
    (0 until 4).foreach(_ => Segments.appendBucketed(df, t, "k", 2))
    assert(Segments.maintainBucketed(spark, t, "k", maxFiles = 4).isEmpty,
      "4 files per bucket is within the bound")
    Segments.appendBucketed(df, t, "k", 2)
    val targets = Segments.maintainBucketed(spark, t, "k", maxFiles = 4)
    assert(targets == Seq(0, 1), s"expected both buckets compacted: $targets")
    assert(spark.table(t).count() == 5 * 400)
    // Co-location survives the tick: zero-exchange keyed count.
    assert(Segments.maintainBucketed(spark, t, "k", maxFiles = 4).isEmpty)
  }
}
