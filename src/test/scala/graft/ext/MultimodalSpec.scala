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

  test("resize composes as a media→media transform with recorded dims") {
    val docs = Seq((1L, "abc"), (2L, "different payload")).toDF("doc_id", "text")
    val resized = Multimodal.resize(Multimodal.mediaFromDocuments(docs), 224, 224)
      .collect().sortBy(_.doc_id)
    assert(resized.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(resized.forall(r => r.width == 224 && r.height == 224 && r.payload.nonEmpty))
    // Deterministic and payload-dependent.
    assert(!resized(0).payload.sameElements(resized(1).payload))
    val again = Multimodal.resize(Multimodal.mediaFromDocuments(docs), 224, 224)
      .collect().sortBy(_.doc_id)
    assert(again(0).payload.sameElements(resized(0).payload))

    // A resize output is itself a valid media table → stages pipeline.
    val feats = Multimodal.extractFeatures(
      Multimodal.resize(Multimodal.mediaFromDocuments(docs), 64, 64).toDF())
    assert(feats.count() == 2)
  }

  test("frame sampling fans out ceil(frames/n) rows per doc") {
    val docs = Seq((1L, "video-ish payload one"), (2L, "another")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    val frameCounts = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.frame_count).toMap

    val n = 4
    val sampled = Multimodal.sampleFrames(media, n).collect()
    val perDoc = sampled.groupBy(_.doc_id).view.mapValues(_.length).toMap
    frameCounts.foreach { case (id, frames) =>
      assert(perDoc(id) == (frames + n - 1) / n, s"doc $id: $frames frames")
    }
    // Indices are the sampled arithmetic progression; digests distinct per frame.
    val s1 = sampled.filter(_.doc_id == 1L).sortBy(_.frame_idx)
    assert(s1.map(_.frame_idx).toSeq == (0 until frameCounts(1L) by n).toSeq)
    assert(s1.map(_.frame_digest).distinct.length == s1.length)
  }
}
