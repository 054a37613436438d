package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.functions.TextFunctions.qualityScore
import org.apache.spark.sql.functions._

/** The streaming curation transaction across micro-batches: quality
  * gating, within-batch dedup, and cross-batch dedup against the
  * digest index the stream itself maintains.
  */
class DocStreamSpec extends SparkTestBase {
  import sqlImplicits._

  // Long diverse sentences pass the q63/q77 quality floor (0.6 needs
  // length × diversity); a short repeated token fails it.
  private val goodA = (1 to 60).map(i => s"alpha$i").mkString(" ")
  private val goodB = (1 to 60).map(i => s"beta$i").mkString(" ")
  private val goodC = (1 to 60).map(i => s"gamma$i").mkString(" ")
  private val junk = "spam spam spam"

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, text) => (id, text, "en", s"src${id % 3}", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("micro-batches gate quality, dedup within the batch, and dedup against prior batches") {
    val root = Files.createTempDirectory("graft_docstream").toString
    val (src, curated, index, ckpt) =
      (s"$root/src", s"$root/curated", s"$root/index", s"$root/ckpt")
    // Seed batch 1 before the stream starts.
    docs(1L -> goodA, 2L -> goodA, 3L -> goodB, 4L -> junk)
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = DocStream.runCurationStream(spark, src, curated, index, ckpt, schema)
    try {
      q.processAllAvailable()
      // Batch 2: an exact copy of goodA (cross-batch dup), a fresh doc,
      // more junk.
      docs(10L -> goodA, 11L -> goodC, 12L -> junk)
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(curated).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // Quality gate: junk (8, 12) never lands.
    assert(!out.map(_._1).toSet.exists(Set(4L, 12L)), s"junk passed the gate: $out")
    // Within-batch dedup: goodA survives once from batch 1 as doc 1.
    // Cross-batch dedup: doc 10 (same text) is filtered by the index.
    assert(out.count(_._2 == goodA) == 1, s"goodA duplicated: $out")
    assert(out.map(_._1).toSet == Set(1L, 3L, 11L), s"unexpected survivors: $out")
    // The index holds exactly the distinct curated digests.
    val idx = spark.read.parquet(index).select("h").distinct().count()
    assert(idx == 3, s"index should hold 3 digests, has $idx")
    // And everything curated clears the quality floor.
    val flo = spark.read.parquet(curated)
      .filter(qualityScore(col("text")) < graft.pipeline.TextPipeline.QualityFloor).count()
    assert(flo == 0)
  }
}
