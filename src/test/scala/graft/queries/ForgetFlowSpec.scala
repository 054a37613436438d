package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.{ManifestLog, Tables}

/** The right-to-be-forgotten flow END TO END: one tombstone set drives
  * BOTH layers — [[graft.util.ManifestLog.deleteKeys]] on the
  * manifested corpus log (the base data) and the artifact-level
  * retraction family (the derived state) — and the two must agree:
  * the retracted artifact equals the artifact rebuilt from the
  * post-delete corpus, the pre-delete world stays auditable until
  * vacuum, and vacuum is where the forgotten text actually leaves the
  * disk. This is the composition the per-layer specs
  * (ManifestDeleteSpec, RetractionSpec) each prove half of.
  */
class ForgetFlowSpec extends SparkTestBase with graft.ArtifactSpecHelpers {
  import sqlImplicits._

  private val sf = "/root/testdata/sf0.001"

  test("one tombstone set: corpus delete + artifact retraction agree, audit until vacuum, then gone") {
    // The corpus as a manifested doc-id-sorted log (the ingest shape).
    val root = s"${tempCorpusDir("graft_forget")}/docs"
    Tables.tbl(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source")
      .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
      .write.parquet(root)
    ManifestLog.adopt(spark, root, Some("doc_id"))

    // Derived state built from the live corpus, at rest.
    val tf = atRest(TextOps.termFrequenciesOf(ManifestLog.read(spark, root)), "tf")

    // The tombstone request, at rest (an id list, not a corpus filter).
    val tombs = atRest(ManifestLog.read(spark, root)
      .where(col("doc_id") % 7 === 3).select("doc_id"), "tombs")
    val nTomb = tombs.count()
    assert(nTomb > 0)

    val preV = ManifestLog.currentVersion(spark, root)
    val res = ManifestLog.deleteKeys(spark, root, "doc_id", tombs, Some("doc_id"))
    assert(res.rowsDeleted == nTomb, s"got $res")
    val retracted = TextOps.retractByDocId(tf, tombs)

    // The two layers agree: retracting the artifact == rebuilding it
    // from the post-delete corpus.
    assert(rows(retracted) ==
      rows(TextOps.termFrequenciesOf(ManifestLog.read(spark, root))),
      "retracted artifact diverged from the post-delete corpus rebuild")

    // Audit window: the pre-delete generation still serves the
    // deleted docs (regulated deletions are logged before destroyed).
    assert(ManifestLog.readAt(spark, root, preV)
      .join(tombs, "doc_id").count() == nTomb)

    // Disposal: vacuum removes the bytes; no file under the root —
    // live or retired — still holds a tombstoned document.
    assert(ManifestLog.vacuum(spark, root).nonEmpty)
    assert(spark.read.parquet(root).join(tombs, "doc_id").count() == 0L,
      "forgotten documents survived vacuum on disk")
  }
}
