package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media pipeline: binary plumbing, batch shape, deterministic stub decode") {
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf).limit(100))
    val feats = Multimodal.extractFeatures(media, partitions = 4, batchSize = 8)
      .collect()
    assert(feats.length == 100)
    // deterministic: same bytes -> same decode
    val again = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sf).limit(100)),
      partitions = 2, batchSize = 32).collect()
    assert(feats.sortBy(_.media_id).map(f => (f.content_sha, f.width, f.height)).toSeq ==
      again.sortBy(_.media_id).map(f => (f.content_sha, f.width, f.height)).toSeq)
    // schema/shape invariants a real codec integration relies on
    assert(feats.forall(f => f.features.length == 8))
    assert(feats.forall(f => f.width >= 1 && f.width <= 1024))
    assert(feats.forall(f => f.byte_len > 0))
    val kinds = feats.map(_.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
    // video frame counts differ from image (kind-sensitive decode path)
    assert(feats.filter(_.kind == "image").forall(_.n_frames == 1))
  }

  test("null content is tolerated (empty blob, not a crash)") {
    val ds = Seq(Multimodal.MediaRecord(1L, "image", null, "x")).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.byte_len == 0L && f.content_sha.nonEmpty)
  }
}
