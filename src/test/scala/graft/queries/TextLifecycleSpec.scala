package graft.queries



import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.Tables

/** Interleaved lifecycle — production ingest is not append-only and
  * not delete-only: ticks MIX batches and tombstones (docs arrive,
  * takedowns land, more docs arrive, a licensing change retracts a
  * slice). TextMultiBatchSpec proved N appends converge; RetractionSpec
  * proved one delete converges; this spec proves the two COMPOSE: a
  * 4-tick append/retract/append/retract schedule, each tick's artifact
  * materialized to parquet and read back (state persists between runs
  * of a real pipeline), lands exactly on the rebuild over the final
  * corpus for one representative per maintenance geometry:
  *
  *   - tf table         (APPEND   : union in, anti-join out)
  *   - shingle-df       (FOLD     : positive fold in, negative out)
  *   - term-stats       (FOLD+MIN : the non-invertible first_doc path
  *                       exercised mid-schedule — tick 2 deletes the
  *                       corpus minimum doc_id)
  *   - digest-counts    (REFCOUNT : claims up on insert, down on
  *                       delete; the set view equals the rebuild set)
  *
  * The per-tick round-trip is load-bearing twice over: it proves
  * tick-over-tick schema stability (nullability pinned by the
  * coalesce-wrapped folds), and it forces each tick to read the
  * AT-REST artifact rather than re-planning prior ticks.
  */
class TextLifecycleSpec extends SparkTestBase with graft.ArtifactSpecHelpers {

  private val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame = Tables.tbl(spark, sf, "documents")

  // The schedule over the real corpus, split by doc_id quartile:
  //   tick 1: append Q1∪Q2       tick 2: retract the mod-5 slice of Q1
  //   tick 3: append Q3∪Q4       tick 4: retract the mod-7 slice of Q3
  // Tick 2 includes the corpus min doc_id (it is in Q1 and 0 mod 5 ≡
  // its own residue only if hit — the slice is widened to force it),
  // exercising term-stats' first_doc recompute mid-schedule.
  private lazy val (q13, q4mins): (Seq[DataFrame], DataFrame) = {
    val r = docs.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val q = (hi - lo) / 4
    val quart = (i: Int) => docs.filter(
      col("doc_id") >= lo + i * q &&
        (if (i == 3) col("doc_id") <= hi else col("doc_id") < lo + (i + 1) * q))
    (Seq(quart(0).unionByName(quart(1)), quart(2).unionByName(quart(3))),
      docs.filter(col("doc_id") === lo))
  }

  private lazy val del1: DataFrame =
    q13.head.filter(col("doc_id") % 5 === 0).unionByName(q4mins).distinct()
  private lazy val del2: DataFrame = q13(1).filter(col("doc_id") % 7 === 0)

  /** The corpus the schedule converges to. */
  private lazy val finalDocs: DataFrame =
    docs.join(del1.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(del2.select("doc_id"), Seq("doc_id"), "left_anti")

  private def ids(d: DataFrame, name: String): DataFrame =
    atRest(d.select("doc_id"), name)

  test("tf table: append/retract/append/retract lands on the final-corpus rebuild") {
    var state = atRest(TextOps.termFrequenciesOf(q13.head), "tf-t1")
    state = atRest(TextOps.retractByDocId(state, ids(del1, "tf-d1")), "tf-t2")
    state = atRest(TextOps.mergeTermFrequencies(state, q13(1)), "tf-t3")
    state = atRest(TextOps.retractByDocId(state, ids(del2, "tf-d2")), "tf-t4")
    assert(rows(state) == rows(TextOps.termFrequenciesOf(finalDocs)))
  }

  test("shingle-df: interleaved positive and negative folds land on the rebuild") {
    // Each tick also maintains the per-doc shingle grain the negative
    // fold draws its partials from — exactly what production holds.
    var grain = atRest(TextOps.shingleHashesOf(q13.head, 3), "shg-t1")
    var state = atRest(TextOps.shingleDfOf(q13.head, 3), "sdf-t1")
    state = atRest(TextOps.retractShingleDf(state, grain, ids(del1, "sdf-d1")), "sdf-t2")
    grain = atRest(TextOps.retractByDocId(grain, ids(del1, "sdf-d1b")), "shg-t2")
    state = atRest(TextOps.mergeShingleDf(state, q13(1), 3), "sdf-t3")
    grain = atRest(TextOps.mergeShingleHashes(grain, q13(1), 3), "shg-t3")
    state = atRest(TextOps.retractShingleDf(state, grain, ids(del2, "sdf-d2")), "sdf-t4")
    assert(rows(state) == rows(TextOps.shingleDfOf(finalDocs, 3)))
  }

  test("term-stats: the first_doc min survives an interleaved schedule deleting the corpus minimum") {
    var tf = atRest(TextOps.termFrequenciesOf(q13.head), "ts-tf-t1")
    var state = atRest(TextOps.termStatsOf(tf), "ts-t1")
    state = atRest(TextOps.retractTermStats(state, tf, ids(del1, "ts-d1")), "ts-t2")
    tf = atRest(TextOps.retractByDocId(tf, ids(del1, "ts-d1b")), "ts-tf-t2")
    state = atRest(TextOps.mergeTermStats(state, TextOps.termFrequenciesOf(q13(1))), "ts-t3")
    tf = atRest(TextOps.mergeTermFrequencies(tf, q13(1)), "ts-tf-t3")
    state = atRest(TextOps.retractTermStats(state, tf, ids(del2, "ts-d2")), "ts-t4")
    val rebuild = TextOps.termStatsOf(TextOps.termFrequenciesOf(finalDocs))
    assert(rows(state) == rows(rebuild))
  }

  test("digest-counts: refcounts go up and down across ticks; the set view equals the rebuild") {
    var state = atRest(TextOps.digestCountsOf(q13.head), "dc-t1")
    state = atRest(TextOps.retractDigestCounts(state, del1), "dc-t2")
    state = atRest(TextOps.mergeDigestCounts(state, q13(1)), "dc-t3")
    state = atRest(TextOps.retractDigestCounts(state, del2), "dc-t4")
    assert(rows(state) == rows(TextOps.digestCountsOf(finalDocs)))
    assert(rows(TextOps.digestSetView(state)) == rows(TextOps.digestsOf(finalDocs)))
  }
}
