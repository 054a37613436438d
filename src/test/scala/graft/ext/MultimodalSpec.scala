package graft.ext

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import sqlImplicits._

  test("extractFeatures: binary plumbing, deterministic stub decode, batch shape") {
    val docs = Seq(
      (1L, "hello world"),
      (2L, ""),
      (3L, "a much longer document body with more bytes"),
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("payload").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.map(_.doc_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).n_bytes == 11 && feats(1).n_bytes == 0)
    assert(feats.forall(f => f.width >= 64 && f.height >= 64 && f.frame_count >= 1))
    assert(feats(0).digest.length == 16)

    // Determinism: same payload → same stub features on a second run.
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(again.map(f => (f.width, f.height, f.frame_count)).toSeq ==
      feats.map(f => (f.width, f.height, f.frame_count)).toSeq)
  }
}
