package graft.queries

import java.nio.file.Files

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
class TextMaintenanceSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // The q151/q145 hwm geometry applied to doc ids: base = first 80% of
  // the id span ("already ingested"), batch = the rest ("arriving").
  private lazy val (baseDocs, batchDocs): (DataFrame, DataFrame) = {
    val docs = Tables.tbl(spark, sf, "documents")
    val r = docs.agg(min("doc_id"), max("doc_id")).head()
    val cutoff = r.getLong(0) + (r.getLong(1) - r.getLong(0)) * 8 / 10
    (docs.filter(col("doc_id") < cutoff), docs.filter(col("doc_id") >= cutoff))
  }

  /** Round-trip the base artifact through parquet: the merge must read
    * the compact AT-REST table (as production would), not re-plan the
    * base build — and it lets the plan pin count documents scans.
    */
  private def atRest(df: DataFrame, name: String): DataFrame = {
    val out = s"${Files.createTempDirectory(s"graft_maint_$name")}/$name"
    df.write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  private def docScans(df: DataFrame): Int =
    df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.count(l => l.contains("Location") && l.contains("documents.parquet"))

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
}
