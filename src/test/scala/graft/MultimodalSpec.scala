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

  test("resize plan fits the box, preserves aspect, never upscales") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf).limit(100))
    val dims = Multimodal.extractFeatures(media).toDF()
      .select($"media_id", $"width", $"height",
        Multimodal.resizeDims($"width", $"height", 256).as("r"))
      .select($"width", $"height", $"r.new_w", $"r.new_h")
      .collect()
    dims.foreach { r =>
      val (w, h, nw, nh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(nw <= 256 && nh <= 256 && nw >= 1 && nh >= 1)
      assert(nw <= w && nh <= h) // never upscale
      if (math.max(w, h) <= 256) assert(nw == w && nh == h)
      else {
        // aspect preserved to integer truncation: one integer division
        // per side bounds the relative drift by ~1/min(new dims)
        val tol = math.max(0.05, 2.0 / math.min(nw, nh))
        assert(math.abs(nw.toDouble / nh - w.toDouble / h) / (w.toDouble / h) <= tol,
          s"aspect drift: ${w}x$h -> ${nw}x$nh")
      }
    }
  }

  test("frame sampling: evenly spaced, in range, deterministic") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.documents(spark, sf).limit(100))
    val rows = Multimodal.extractFeatures(media).toDF()
      .filter($"kind" === "video")
      .select($"n_frames",
        Multimodal.sampleFrameIndices($"n_frames", 8).as("idx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getInt(0)
      val idx = r.getSeq[Int](1)
      assert(idx.nonEmpty && idx.length <= 8)
      assert(idx == idx.sorted && idx.distinct == idx)
      assert(idx.head == 0 && idx.last < n)
      if (n >= 8) assert(idx.length == 8)
    }
  }

  test("null content is tolerated (empty blob, not a crash)") {
    val ds = Seq(Multimodal.MediaRecord(1L, "image", null, "x")).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.byte_len == 0L && f.content_sha.nonEmpty)
  }
}
