package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.Tables

/** Incremental maintenance of the at-rest TEXT artifacts — the last
  * full-rebuild-only family after q145 (SCD2 rows) and q151 (partsupp
  * aggregate): on the real corpus split at a doc_id high-water mark,
  * each merge of (at-rest base artifact, new document batch) must
  * reproduce the full-corpus rebuild row-for-row, and the merge plan
  * must read the BATCH's text only — re-tokenizing history would make
  * the "incremental" path a rebuild with extra steps. Three geometries:
  *   - term-frequencies: APPEND (per-doc grain, batches disjoint by
  *     doc_id — a pure union, base never shuffles);
  *   - bigram-frequencies: ADDITIVE FOLD (the q151 algebra on the
  *     corpus-global gram counts);
  *   - digest-index: SET INSERT (anti-join append of unseen digests).
  */
class TextMaintenanceSpec extends SparkTestBase with graft.ArtifactSpecHelpers {

  private val sf = "/root/testdata/sf0.001"

  // The q151/q145 hwm geometry applied to doc ids: base = first 80% of
  // the id span ("already ingested"), batch = the rest ("arriving").
  private lazy val (baseDocs, batchDocs): (DataFrame, DataFrame) = {
    val docs = Tables.tbl(spark, sf, "documents")
    val r = docs.agg(min("doc_id"), max("doc_id")).head()
    val cutoff = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 8 / 10
    (docs.filter(col("doc_id") < cutoff), docs.filter(col("doc_id") >= cutoff))
  }

  test("tf-table merge (append geometry) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.termFrequenciesOf(baseDocs), "tf")
    val merged = TextOps.mergeTermFrequencies(base, batchDocs)
    assert(docScans(merged) == 1, "append merge must tokenize ONLY the batch")
    assert(rows(merged) == rows(TextOps.termFrequenciesOf(Tables.tbl(spark, sf, "documents"))))
    // The split is non-trivial: both sides contributed rows.
    assert(base.count() > 0 && merged.count() > base.count())
  }

  test("gram-table merge (additive fold) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.bigramFrequenciesOf(baseDocs), "bigrams")
    val merged = TextOps.mergeBigramFrequencies(base, batchDocs)
    assert(docScans(merged) == 1, "fold merge must tokenize ONLY the batch")
    assert(rows(merged) == rows(TextOps.bigramFrequenciesOf(Tables.tbl(spark, sf, "documents"))))
    // The fold genuinely merged: some gram appears on both sides of the
    // hwm (otherwise this would only exercise the append path).
    val overlap = base.join(TextOps.bigramFrequenciesOf(batchDocs), Seq("g"), "left_semi").count()
    assert(overlap > 0, "hwm split produced no shared grams — fold untested")
  }

  test("digest-index merge (set insert) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.digestsOf(baseDocs), "digests")
    val merged = TextOps.mergeDigestIndex(base, batchDocs)
    assert(docScans(merged) == 1, "insert merge must digest ONLY the batch")
    assert(rows(merged) == rows(TextOps.digestsOf(Tables.tbl(spark, sf, "documents"))))
  }

  // The signature artifacts (r10 verdict item 6): per-doc grain like
  // the tf table, so both take the APPEND geometry — a signature
  // depends only on its own document's text, and documents arrive
  // whole, so batch rows are doc_id-disjoint from the base and the
  // merge is a pure union. The pin that matters is the plan one: the
  // merge must shingle/hash the BATCH text only — an accidental
  // full-corpus dependency would re-run the costliest build in the
  // text module on every ingest tick.

  test("minhash-sigs merge (append geometry) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.minhashSigsOf(baseDocs), "minhash-sigs")
    val merged = TextOps.mergeMinhashSigs(base, batchDocs)
    assert(docScans(merged) == 1, "signature merge must shingle ONLY the batch")
    assert(rows(merged) == rows(TextOps.minhashSigsOf(Tables.tbl(spark, sf, "documents"))))
    // Both sides contributed signature rows (hwm split non-trivial).
    assert(base.count() > 0 && merged.count() > base.count())
  }

  test("simhash-sigs-60 merge (append geometry) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.simhash60SigsOf(baseDocs), "simhash-sigs-60")
    val merged = TextOps.mergeSimhash60Sigs(base, batchDocs)
    assert(docScans(merged) == 1, "signature merge must hash ONLY the batch")
    assert(rows(merged) == rows(TextOps.simhash60SigsOf(Tables.tbl(spark, sf, "documents"))))
    assert(base.count() > 0 && merged.count() > base.count())
  }

  // The shingle-chain artifacts, closing the family: with these three,
  // EVERY at-rest text artifact has a maintenance path whose geometry
  // matches its grain — per-(doc,shingle) rows and per-doc set/signature
  // rows APPEND; the corpus-global df and gram counts FOLD.

  test("shingle-table merge (append geometry) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.shingleHashesOf(baseDocs, 3), "shingles-k3")
    val merged = TextOps.mergeShingleHashes(base, batchDocs, 3)
    assert(docScans(merged) == 1, "shingle merge must shingle ONLY the batch")
    assert(rows(merged) == rows(TextOps.shingleHashesOf(Tables.tbl(spark, sf, "documents"), 3)))
    assert(base.count() > 0 && merged.count() > base.count())
  }

  test("term-stats merge (additive fold) equals the full rebuild; batch is the only text scan") {
    // df and ct are counts over doc-disjoint batches (they add) and
    // first_doc is an associative min — all three columns fold.
    val base = atRest(TextOps.termStatsOf(TextOps.termFrequenciesOf(baseDocs)), "term-stats")
    val merged = TextOps.mergeTermStats(base, TextOps.termFrequenciesOf(batchDocs))
    assert(docScans(merged) == 1, "stats fold must tokenize ONLY the batch")
    assert(rows(merged) == rows(TextOps.termStatsOf(
      TextOps.termFrequenciesOf(Tables.tbl(spark, sf, "documents")))))
    // The fold is non-trivial in all three columns: some term appears
    // on both sides of the hwm, and some batch-side term has an
    // earlier base-side first_doc (the min path genuinely folds).
    val batchStats = TextOps.termStatsOf(TextOps.termFrequenciesOf(batchDocs))
    val overlap = base.join(batchStats, Seq("term"), "left_semi").count()
    assert(overlap > 0, "hwm split produced no shared terms — fold untested")
  }

  test("shingle-df merge (additive fold) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.shingleDfOf(baseDocs, 4), "shingle-df-k4")
    val merged = TextOps.mergeShingleDf(base, batchDocs, 4)
    assert(docScans(merged) == 1, "df fold must shingle ONLY the batch")
    assert(rows(merged) == rows(TextOps.shingleDfOf(Tables.tbl(spark, sf, "documents"), 4)))
    // The fold genuinely merged: some hash has df contributions on both
    // sides of the hwm (otherwise only the append path is exercised).
    val overlap = base.join(TextOps.shingleDfOf(batchDocs, 4), Seq("h"), "left_semi").count()
    assert(overlap > 0, "hwm split produced no shared shingle hashes — fold untested")
  }

  test("doc-shingle-sets merge (append geometry) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.docShingleSetsOf(baseDocs, 4), "doc-shingle-sets-k4")
    val merged = TextOps.mergeDocShingleSets(base, batchDocs, 4)
    assert(docScans(merged) == 1, "doc-set merge must shingle ONLY the batch")
    assert(rows(merged) == rows(TextOps.docShingleSetsOf(Tables.tbl(spark, sf, "documents"), 4)))
    assert(base.count() > 0 && merged.count() > base.count())
  }

  test("span-window merge (append geometry) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.spanWindowsOf(baseDocs), "span-windows")
    val merged = TextOps.mergeSpanWindows(base, batchDocs)
    assert(docScans(merged) == 1, "span merge must tokenize ONLY the batch")
    assert(rows(merged) == rows(TextOps.spanWindowsOf(Tables.tbl(spark, sf, "documents"))))
    assert(base.count() > 0 && merged.count() > base.count())
  }

  test("chunk-table merge (append geometry) equals the full rebuild; batch is the only text scan") {
    val base = atRest(TextOps.chunkFrameOf(baseDocs), "context-chunks")
    val merged = TextOps.mergeChunkTable(base, batchDocs)
    assert(docScans(merged) == 1, "chunk merge must tokenize ONLY the batch")
    assert(rows(merged) == rows(TextOps.chunkFrameOf(Tables.tbl(spark, sf, "documents"))))
    assert(base.count() > 0 && merged.count() > base.count())
  }

  test("lsh-cluster-labels merge (seeded component merge) equals the full rebuild") {
    // The fifth geometry (r11 verdict item 5): arriving docs can join
    // and BRIDGE existing clusters, but base–base edges never change,
    // so the merge contracts touched components to their labels, runs
    // the fixpoint over the contracted batch graph only, and passes
    // untouched components through verbatim.
    val base = atRest(TextOps.lshClusterLabelsOf(baseDocs), "lsh-labels")
    val baseBands = atRest(
      TextOps.bandKeysOf(TextOps.minhashSigsOf(baseDocs)), "lsh-bands")
    val baseSets = atRest(TextOps.docShingleSetsOf(baseDocs, 3), "lsh-sets")
    val merged = TextOps.mergeLshClusterLabels(base, baseBands, baseSets, batchDocs)
    val rebuild = TextOps.lshClusterLabelsOf(Tables.tbl(spark, sf, "documents"))
    assert(rows(merged) == rows(rebuild))
    // Final-plan text pin: the one batch scan happened eagerly at
    // merge time (the checkpointed shingle frame); the assembled
    // output reads at-rest artifacts and fixpoint checkpoints only.
    assert(docScans(merged) == 0,
      "label merge must not re-tokenize anything in the final plan")
    // Untouched components genuinely passed through: every row that
    // differs from the base belongs to a batch doc or a batch-touched
    // component, and at least one base component survived verbatim.
    val batchIds = batchDocs.select("doc_id").collect().map(_.getLong(0)).toSet
    val baseRows = base.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mergedRows = merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val changed = mergedRows.filter { case (d, l) => baseRows.get(d) != Some(l) }
    val touchedComps = changed.collect {
      case (d, _) if !batchIds.contains(d) => baseRows.get(d) }.flatten.toSet
    val untouchedComps = baseRows.values.toSet -- touchedComps
    assert(untouchedComps.nonEmpty, "every base component touched — pass-through path untested")
    untouchedComps.foreach { c =>
      baseRows.filter(_._2 == c).foreach { case (d, l) =>
        assert(mergedRows.get(d) == Some(l), s"untouched component $c row $d changed")
      }
    }
    // The merge genuinely exercised cluster ADMISSION: some batch doc
    // landed in a component labeled by a base doc.
    val joinedBase = mergedRows.exists { case (d, l) =>
      batchIds.contains(d) && !batchIds.contains(l) }
    assert(joinedBase, "no batch doc joined an existing cluster — admission path untested")
  }

  test("linkage-blocks merge (partitioned refresh) equals the full rebuild; batch is the only text scan") {
    // The fourth geometry: the sub-block rank makes this the one text
    // artifact where arriving rows can CHANGE existing rows — but only
    // within the blocks the batch lands in. The merge must (a) rebuild
    // exactly, (b) read batch text only (the base artifact carries the
    // keyed columns), and (c) genuinely exercise the refresh: some
    // base row's sub must change, and some block must survive verbatim
    // through the anti-join path.
    val base = atRest(
      TextOps.linkageRank(TextOps.linkageKeyed(baseDocs)), "linkage-blocks")
    val merged = TextOps.mergeLinkageBlocks(base, batchDocs)
    // THREE batch-text scans, not one: the batch's keys play three
    // roles (anti-join vs untouched blocks, semi-join selecting the
    // touched base rows, the re-rank union) and Catalyst plans a
    // shared subtree once per reference. All three scan the BATCH —
    // at ingest that is 3× a small arriving batch; the pin that
    // matters is that history text never appears (the base side reads
    // only the staged artifact, which this count proves) and that the
    // count stays 3 (a 4th = a lineage regression). A production
    // pipeline that stages the batch's keyed rows as their own table
    // pays the keying once — the spec exercises the unstaged worst
    // case.
    assert(docScans(merged) == 3, "block refresh must normalize ONLY the batch text")
    // Row equality to the full rebuild through the production rank
    // definition itself — no locally re-stated cap to drift.
    val rebuild = TextOps.linkageRank(
      TextOps.linkageKeyed(Tables.tbl(spark, sf, "documents")))
    assert(rows(merged) == rows(rebuild))
    // The refresh is non-trivial both ways: touched and untouched
    // blocks both exist in this corpus split.
    val touched = TextOps.linkageKeyed(batchDocs).select("b").distinct()
    val nTouchedBase = base.join(touched, Seq("b"), "left_semi").count()
    val nUntouched = base.join(touched, Seq("b"), "left_anti").count()
    assert(nTouchedBase > 0, "no base block touched — refresh path untested")
    assert(nUntouched > 0, "every block touched — anti-join path untested")
  }
}
