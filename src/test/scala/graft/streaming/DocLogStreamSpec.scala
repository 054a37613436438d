package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.ManifestLog

/** The manifest-native curation transaction: DocStream's semantics
  * (gate, within-batch dedup, cross-batch dedup) with two-table
  * exactly-once derived from appendBatch idempotence + deterministic
  * recompute — drilled at every crash window — plus the manifest
  * extras: audit trail, time travel, and survivors as a tailable feed.
  */
class DocLogStreamSpec extends SparkTestBase with graft.TempCorpusDirs {
  import sqlImplicits._

  private final class InjectedCrash extends RuntimeException("injected crash")

  private val goodA = (1 to 60).map(i => s"alpha$i").mkString(" ")
  private val goodB = (1 to 60).map(i => s"beta$i").mkString(" ")
  private val goodC = (1 to 60).map(i => s"gamma$i").mkString(" ")
  private val junk = "spam spam spam"

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, text) => (id, text, "en", s"src${id % 3}", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("micro-batches curate exactly once, with trail, time travel, and a survivor feed") {
    val root = tempCorpusDir("graft_doclog")
    val (src, curated, index, ckpt) =
      (s"$root/src", s"$root/curated", s"$root/index", s"$root/ckpt")
    docs(1L -> goodA, 2L -> goodA, 3L -> goodB, 4L -> junk)
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = DocLogStream.runCurationStream(spark, src, curated, index, ckpt, schema)
    try {
      q.processAllAvailable()
      docs(10L -> goodA, 11L -> goodC, 12L -> junk)
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()

    val out = ManifestLog.read(spark, curated).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    // Gate, within-batch dedup, cross-batch dedup — DocStream's contract.
    assert(out.map(_._1).toSet == Set(1L, 3L, 11L), s"unexpected survivors: $out")
    assert(out.count(_._2 == goodA) == 1)
    assert(ManifestLog.read(spark, index).select("h").distinct().count() == 3)
    // Manifest extras. Audit: one create + one append-batch per batch.
    assert(ManifestLog.describe(spark, curated).map(_._2) ==
      Seq("create", "append-batch", "append-batch"))
    // Time travel: the corpus as of batch 0.
    assert(ManifestLog.readAt(spark, curated, 2L).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L))
    // The survivor feed: batch 1's contribution alone.
    ManifestLog.tailSince(spark, curated, 2L) match {
      case a: ManifestLog.TailAppended =>
        assert(ManifestLog.readTail(spark, curated, a).get
          .select("doc_id").as[Long].collect().toSeq == Seq(11L))
      case r: ManifestLog.TailResync => fail(r.reason)
    }
  }

  test("every crash window replays to the clean-run state") {
    // Window k = die at the k-th table append of batch 1 (1 = before
    // the curated commit, 2 = between the two commits — the torn
    // two-table state the marker protocol exists for).
    (1 to 2).foreach { window =>
      val root = tempCorpusDir(s"graft_doclog_torn$window")
      val (curated, index) = (s"$root/curated", s"$root/index")
      assert(DocLogStream.curateBatch(docs(1L -> goodA, 2L -> goodB), 0L, curated, index))

      var n = 0
      ManifestLog.failpoint = s => if (s.startsWith("written:append-batch")) {
        n += 1
        if (n == window) throw new InjectedCrash
      }
      try intercept[InjectedCrash] {
        DocLogStream.curateBatch(docs(10L -> goodA, 11L -> goodC), 1L, curated, index)
      } finally ManifestLog.failpoint = _ => ()

      if (window == 2) {
        // The one torn state: curated holds batch 1, the index does not.
        assert(ManifestLog.batchHwm(spark, curated) == 1L)
        assert(ManifestLog.batchHwm(spark, index) == 0L)
      }
      // The checkpointed replay converges both tables.
      assert(DocLogStream.curateBatch(docs(10L -> goodA, 11L -> goodC), 1L, curated, index))
      val out = ManifestLog.read(spark, curated).select("doc_id").as[Long].collect().toSeq
      assert(out.sorted == Seq(1L, 2L, 11L), s"window $window: $out")
      assert(ManifestLog.read(spark, index).count() == 3, s"window $window")
      // A replay AFTER full commit is a pure no-op: no new versions.
      val vs = (ManifestLog.currentVersion(spark, curated),
        ManifestLog.currentVersion(spark, index))
      assert(!DocLogStream.curateBatch(docs(10L -> goodA, 11L -> goodC), 1L, curated, index))
      assert((ManifestLog.currentVersion(spark, curated),
        ManifestLog.currentVersion(spark, index)) == vs, s"window $window")
      // And the NEXT batch still dedups against everything curated.
      assert(DocLogStream.curateBatch(docs(20L -> goodC, 21L -> junk), 2L, curated, index))
      assert(ManifestLog.read(spark, curated).count() == 3, s"window $window: " +
        "a cross-batch duplicate slipped past the converged index")
    }
  }

  test("an all-duplicate batch acknowledges without files; its replay answers from the guard") {
    val root = tempCorpusDir("graft_doclog_empty")
    val (curated, index) = (s"$root/curated", s"$root/index")
    assert(DocLogStream.curateBatch(docs(1L -> goodA), 0L, curated, index))
    val files = ManifestLog.liveFileCount(spark, curated)
    // Batch 1: one dup, one junk — nothing survives.
    assert(DocLogStream.curateBatch(docs(10L -> goodA, 11L -> junk), 1L, curated, index))
    assert(ManifestLog.liveFileCount(spark, curated) == files,
      "an empty survivor set must not add files")
    assert(ManifestLog.batchHwm(spark, curated) == 1L)
    assert(ManifestLog.batchHwm(spark, index) == 1L)
    assert(!DocLogStream.curateBatch(docs(10L -> goodA, 11L -> junk), 1L, curated, index))
    // Curation continues normally.
    assert(DocLogStream.curateBatch(docs(20L -> goodB), 2L, curated, index))
    assert(ManifestLog.read(spark, curated).count() == 2)
  }
}
