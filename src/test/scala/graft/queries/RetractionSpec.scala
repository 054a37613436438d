package graft.queries



import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.Tables

/** Retraction — the DELETE half of the at-rest maintenance lifecycle
  * (the merge family's inverse; see the retraction section at the end
  * of TextOps). On the real corpus with a spread tombstone set, every
  * retraction must reproduce the rebuild-on-survivors row-for-row, and
  * the plan must never re-derive the SURVIVING corpus:
  *   - APPEND artifacts retract by anti-join — zero text scans;
  *   - FOLD artifacts subtract the deleted docs' partials — zero text
  *     scans where a per-doc grain exists at rest (shingle-df via the
  *     shingle table, term-stats via tf), one deleted-docs-only scan
  *     where it does not (gram table);
  *   - the digest index retracts through its REFCOUNTED form — the
  *     planted-duplicate test shows the plain set's anti-join would
  *     drop a digest a surviving claimant still holds;
  *   - linkage-blocks re-rank only the deleted docs' blocks;
  *   - lsh-cluster-labels re-fixpoint only the touched components,
  *     from at-rest bands + doc-sets (deletion can SPLIT a cluster,
  *     so the merge path's contraction trick is unsound here).
  */
class RetractionSpec extends SparkTestBase with graft.ArtifactSpecHelpers {

  private val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame = Tables.tbl(spark, sf, "documents")

  /** Spread tombstones plus the corpus's minimum doc_id — the min is
    * first_doc for many terms (everything in the first doc that recurs
    * later), so deleting it exercises term-stats' non-invertible-min
    * recompute, and at sf0.001 it is also a cluster member, so the LSH
    * retraction genuinely touches a component. */
  private lazy val minDocId: Long = docs.agg(min("doc_id")).head().getLong(0)

  private def isDeleted = col("doc_id") % 7 === 3 || col("doc_id") === minDocId

  /** The tombstone request as production receives it: an id list at
    * rest (parquet round-trip), NOT a corpus filter — so the plan pins
    * below can assert the retraction reads no document text at all.
    */
  private lazy val deletedIds: DataFrame =
    atRest(docs.filter(isDeleted).select("doc_id"), "deleted-ids")

  private lazy val deletedDocs: DataFrame = docs.filter(isDeleted)
  private lazy val survivors: DataFrame = docs.filter(!isDeleted)

  /** At-rest schema equality (what a downstream consumer of the
    * maintained artifact sees tick over tick): both frames written to
    * parquet and compared on the read-back schema. */
  private def sameAtRestSchema(a: DataFrame, b: DataFrame, name: String): Unit =
    assert(atRest(a, s"$name-l").schema == atRest(b, s"$name-r").schema,
      s"$name: at-rest schema drifted between retraction and rebuild")

  test("the tombstone split is non-trivial") {
    assert(deletedIds.count() > 0 && survivors.count() > 0)
    // Even ids among the deleted: the digest family's population is hit.
    assert(deletedDocs.filter(col("doc_id") % 2 === 0).count() > 0)
  }

  test("append-geometry retraction (tf table) equals the survivors rebuild with NO text scan") {
    val base = atRest(TextOps.termFrequenciesOf(docs), "tf")
    val retracted = TextOps.retractByDocId(base, deletedIds)
    assert(docScans(retracted) == 0, "anti-join retraction must read no document text")
    assert(rows(retracted) == rows(TextOps.termFrequenciesOf(survivors)))
    assert(retracted.count() < base.count(), "retraction removed nothing — tombstones missed the grain")
  }

  test("append-geometry retraction (minhash-sigs + shingle table) equals the survivors rebuild") {
    val sigs = atRest(TextOps.minhashSigsOf(docs), "minhash-sigs")
    val rSigs = TextOps.retractByDocId(sigs, deletedIds)
    assert(docScans(rSigs) == 0)
    assert(rows(rSigs) == rows(TextOps.minhashSigsOf(survivors)))

    val sh = atRest(TextOps.shingleHashesOf(docs, 3), "shingles-k3")
    val rSh = TextOps.retractByDocId(sh, deletedIds)
    assert(docScans(rSh) == 0)
    assert(rows(rSh) == rows(TextOps.shingleHashesOf(survivors, 3)))
  }

  test("fold retraction (shingle-df via the at-rest shingle grain) equals the survivors rebuild, zero text scans") {
    val shingleTable = atRest(TextOps.shingleHashesOf(docs, 3), "shingles-k3")
    val base = atRest(TextOps.shingleDfOf(docs, 3), "shingle-df")
    val retracted = TextOps.retractShingleDf(base, shingleTable, deletedIds)
    assert(docScans(retracted) == 0, "partials must come from the at-rest shingle grain, not text")
    val rebuild = TextOps.shingleDfOf(survivors, 3)
    assert(rows(retracted) == rows(rebuild))
    sameAtRestSchema(retracted, rebuild, "shingle-df")
    // The zero-crossing case is real: some hash left the table entirely.
    assert(retracted.count() < base.count(), "no df reached zero — the drop-out path went unexercised")
  }

  test("fold retraction (term-stats via the at-rest tf grain) recomputes deleted first_doc minima") {
    val tf = atRest(TextOps.termFrequenciesOf(docs), "tf")
    val base = atRest(TextOps.termStatsOf(tf), "term-stats")
    // The non-invertible-min path is genuinely exercised: some term's
    // recorded first occurrence is a deleted doc that is NOT the term's
    // last claimant (so the term survives and must re-derive its min).
    val affected = base
      .join(deletedIds.withColumnRenamed("doc_id", "first_doc"), Seq("first_doc"), "left_semi")
      .filter(col("df") > 1)
    assert(affected.count() > 0, "tombstones hit no surviving term's first_doc — min recompute untested")
    val retracted = TextOps.retractTermStats(base, tf, deletedIds)
    assert(docScans(retracted) == 0, "term-stats retraction must read only at-rest artifacts")
    val rebuild = TextOps.termStatsOf(TextOps.termFrequenciesOf(survivors))
    assert(rows(retracted) == rows(rebuild))
    sameAtRestSchema(retracted, rebuild, "term-stats")
  }

  test("fold retraction (gram table) re-tokenizes ONLY the deleted docs") {
    val base = atRest(TextOps.bigramFrequenciesOf(docs), "bigrams")
    val retracted = TextOps.retractBigramFrequencies(base, deletedDocs)
    assert(docScans(retracted) == 1, "gram retraction scans the deleted docs once, never the survivors")
    val rebuild = TextOps.bigramFrequenciesOf(survivors)
    assert(rows(retracted) == rows(rebuild))
    sameAtRestSchema(retracted, rebuild, "bigrams")
  }

  test("digest retraction needs the refcount: a surviving duplicate keeps its digest alive") {
    // Planted duplicates (the natural corpus has none): every even doc
    // gains an even-id twin with identical text, then the original
    // mod-4 ids are deleted — each deleted doc's digest is still
    // claimed by its surviving twin, so the correct survivors-rebuild
    // KEEPS every digest while a set-level anti-join would drop them.
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val shift = maxId + (maxId % 2) + 2 // even shift: twins keep even parity
    val twins = docs.filter(col("doc_id") % 2 === 0)
      .withColumn("doc_id", col("doc_id") + lit(shift))
    val corpus = docs.unionByName(twins)
    val deleted = corpus.filter(col("doc_id") <= maxId && col("doc_id") % 4 === 0)
    assert(deleted.count() > 0)
    val surviving = corpus.exceptAll(deleted)

    val base = atRest(TextOps.digestCountsOf(corpus), "digest-counts")
    val retracted = TextOps.retractDigestCounts(base, deleted)
    val rebuildSet = TextOps.digestsOf(surviving)
    assert(rows(TextOps.digestSetView(retracted)) == rows(rebuildSet))
    // The refcount is load-bearing: the plain set's anti-join gets
    // this corpus WRONG (it forgets the surviving twin's claim).
    val naive = TextOps.digestsOf(corpus)
      .join(TextOps.digestsOf(deleted), Seq("h"), "left_anti")
    assert(rows(naive) != rows(rebuildSet),
      "planted corpus failed to exercise the survivor-claims-digest case")
    // And on the natural corpus the refcounted index projects to
    // exactly the set the dedup queries consume today.
    assert(rows(TextOps.digestSetView(TextOps.digestCountsOf(docs))) == rows(TextOps.digestsOf(docs)))
  }

  test("refcounted digest round-trip: N merges then a retraction still equals the rebuild") {
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cut = maxId / 2
    val base = atRest(TextOps.digestCountsOf(docs.filter(col("doc_id") <= cut)), "digest-counts")
    val merged = TextOps.mergeDigestCounts(base, docs.filter(col("doc_id") > cut))
    assert(rows(merged) == rows(TextOps.digestCountsOf(docs)))
    val retracted = TextOps.retractDigestCounts(atRest(merged, "digest-counts-m"), deletedDocs)
    assert(rows(TextOps.digestSetView(retracted)) == rows(TextOps.digestsOf(survivors)))
  }

  test("linkage-blocks retraction re-ranks only the deleted docs' blocks, zero text scans") {
    val base = atRest(TextOps.linkageRank(TextOps.linkageKeyed(docs)), "linkage-blocks")
    val retracted = TextOps.retractLinkageBlocks(base, deletedIds)
    assert(docScans(retracted) == 0, "block retraction reads only the at-rest keyed rows")
    assert(rows(retracted) == rows(TextOps.linkageRank(TextOps.linkageKeyed(survivors))))
    // Both branches of the refresh ran: some block was touched, some not.
    val touched = base.join(deletedIds, Seq("doc_id"), "left_semi").select("b").distinct()
    assert(touched.count() > 0 && touched.count() < base.select("b").distinct().count())
  }

  test("lsh-cluster-labels retraction re-fixpoints touched components only, zero text scans") {
    val labels = atRest(TextOps.lshClusterLabelsOf(docs), "lsh-cluster-labels")
    val bands = atRest(TextOps.minhashBandsOf(docs), "minhash-bands")
    val sets = atRest(TextOps.docShingleSetsOf(docs, 3), "doc-shingle-sets")
    // The tombstones hit labeled docs (cluster retraction genuinely
    // exercised — the min doc_id is a cluster member at this sf).
    val touched = labels.join(deletedIds, Seq("doc_id"), "left_semi").select("cluster_id").distinct()
    assert(touched.count() > 0, "tombstones hit no cluster — label retraction untested")
    val retracted = TextOps.retractLshClusterLabels(labels, bands, sets, deletedIds)
    assert(docScans(retracted) == 0, "label retraction reads only at-rest artifacts")
    assert(rows(retracted) == rows(TextOps.lshClusterLabelsOf(survivors)))
    // Untouched components exist and pass through verbatim (a
    // relabeled component can never take an untouched label: labels
    // are member ids and components have disjoint members, so the
    // semi-join picks exactly the pass-through rows).
    val untouched = labels.join(touched, Seq("cluster_id"), "left_anti")
    assert(untouched.count() > 0)
    assert(rows(retracted.join(untouched.select("cluster_id").distinct(), Seq("cluster_id"), "left_semi"))
      == rows(untouched))
  }

  test("SCD2 forget-user retraction equals the survivors rebuild with no event scan") {
    val e = Events.eventsUs(spark, sf)
    val base = atRest(Events.collapseRuns(e), "scd2-dim")
    val userIds = atRest(
      e.select("user_id").distinct().filter(col("user_id") % 9 === 2), "forgotten-users")
    assert(userIds.count() > 0)
    val retracted = Events.forgetUsersScd2(base, userIds)
    assert(scansOf(retracted, "events.parquet") == 0, "forget-user must not read events")
    assert(rows(retracted) ==
      rows(Events.collapseRuns(e.join(userIds, Seq("user_id"), "left_anti"))))
  }

  test("SCD2 event-level retraction re-collapses only the touched users") {
    val eAtRest = atRest(Events.eventsUs(spark, sf), "events-us")
    val base = atRest(Events.collapseRuns(eAtRest), "scd2-dim")
    // Sampled events of a user SUBSET — the touched/untouched split
    // must be non-trivial (15 users at this sf, so an unrestricted
    // event sample touches everyone).
    val ids = atRest(
      eAtRest.filter(col("user_id") % 3 === 0 && col("event_id") % 11 === 4)
        .select("event_id"), "deleted-events")
    assert(ids.count() > 0)
    val retracted = Events.retractScd2Events(base, eAtRest, ids)
    assert(scansOf(retracted, "events.parquet") == 0,
      "event retraction reads the at-rest log, not raw events")
    val surv = eAtRest.join(ids, Seq("event_id"), "left_anti")
    assert(rows(retracted) == rows(Events.collapseRuns(surv)))
    // Both refresh branches ran.
    val touched = eAtRest.join(ids, Seq("event_id"), "left_semi").select("user_id").distinct()
    assert(touched.count() > 0 &&
      touched.count() < eAtRest.select("user_id").distinct().count())
  }

  test("partsupp retraction refreshes only the deleted rows' groups") {
    val li = Tables.tbl(spark, sf, "lineitem")
    val base = atRest(Relational.partsuppAggOf(li), "partsupp")
    val deleted = li.filter(col("l_orderkey") % 13 === 5)
    val surviving = li.filter(col("l_orderkey") % 13 =!= 5)
    assert(deleted.count() > 0)
    val retracted = Relational.retractPartsupp(base, surviving, deleted)
    assert(rows(retracted) == rows(Relational.partsuppAggOf(surviving)))
    val touched = deleted
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey")).distinct()
    assert(touched.count() > 0 && touched.count() < base.count(),
      "split trivial: every group touched or none")
  }

  test("ANN occupancy retraction (frozen quantizer) equals the survivors rebuild") {
    val assigned = atRest(
      Similarity.assignedVectors(spark, sf).select("vec_id", "cluster"), "ivf-assigned")
    val delIds = assigned.filter(col("vec_id") % 5 === 1).select("vec_id")
    assert(delIds.count() > 0)
    val base = atRest(Similarity.cellSizesOf(assigned), "ivf-cell-sizes")
    val retracted = Similarity.retractCellSizes(
      base, assigned.join(delIds, Seq("vec_id"), "left_semi"))
    val rebuild = Similarity.cellSizesOf(assigned.join(delIds, Seq("vec_id"), "left_anti"))
    assert(rows(retracted) == rows(rebuild))
  }
}
