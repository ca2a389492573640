package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus typed metadata — the schema,
  * partitioning, batch shape, and decode-stage signature are real and
  * tested; only the codec itself is stubbed (this container has no
  * image/audio libraries), clearly marked in [[decodeStub]], with a
  * deterministic fake derived from the content hash so tests are exact.
  *
  * Scale design: decode is the archetypal CPU-heavy embarrassingly
  * parallel stage. The pipeline repartitions by media id (spreads large
  * blobs evenly — media tables are skew-prone because one video can be
  * 1000× one thumbnail) and runs the decoder via `mapPartitions` in
  * fixed-size batches, the JVM analog of Arrow-batched Pandas UDFs: a
  * real codec would amortize model/codec init per batch exactly like
  * `mapInPandas` does. Feature output is a fixed-width float vector
  * ready for [[Similarity]] operators.
  */
object Multimodal {

  /** Canonical media-table schema: id, kind, opaque bytes, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("source_doc", LongType, nullable = true)))

  final case class MediaRecord(media_id: Long, kind: String,
                               content: Array[Byte], mime_type: String)
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                                 content_sha: String, width: Int, height: Int,
                                 n_frames: Int, features: Array[Float])

  /** Pluggable codec boundary: a real JNI/FFI codec binding implements
    * this and drops into [[extractFeatures]] unchanged; [[StubDecoder]]
    * is the deterministic test implementation (this container ships no
    * image/audio libraries). Implementations must be `Serializable` —
    * instances ship to executors; a real binding holds its native
    * handle `@transient lazy` so each executor re-opens it locally. */
  trait Decoder extends Serializable {
    /** Decode one blob: (width, height, n_frames, feature vector). */
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float])
    /** Digest-aware variant: the pipeline SHA-1s each blob exactly once
      * for `content_sha` and passes the digest through so no decoder is
      * forced to hash the (dominant-cost) bytes a second time. Default
      * ignores it; [[StubDecoder]] decodes from it directly. */
    def decode(kind: String, bytes: Array[Byte],
               sha1: Array[Byte]): (Int, Int, Int, Array[Float]) =
      decode(kind, bytes)
  }

  /** Deterministic pseudo-codec: dims/frame-count/8-dim feature vector
    * derived from the content's SHA-1, so specs assert exact values and
    * re-runs are bit-identical. Stands in where a real decoder goes. */
  object StubDecoder extends Decoder {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
      decodeFromDigest(kind,
        java.security.MessageDigest.getInstance("SHA-1").digest(bytes))
    override def decode(kind: String, bytes: Array[Byte],
                        sha1: Array[Byte]): (Int, Int, Int, Array[Float]) =
      decodeFromDigest(kind, sha1)
  }

  /** The stub codec under its historical name (specs, docs). */
  def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
    StubDecoder.decode(kind, bytes)

  /** Stub decode from a pre-computed digest. */
  def decodeFromDigest(kind: String, sha: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    def u(i: Int): Int = sha(i) & 0xff
    val width = 1 + ((u(0) << 8 | u(1)) % 1024)
    val height = 1 + ((u(2) << 8 | u(3)) % 1024)
    val frames = kind match {
      case "video" => 1 + (u(4) % 240)
      case "audio" => 1 + (u(4) % 48000)
      case _ => 1
    }
    val feat = Array.tabulate(8)(i => (u(4 + i) / 255.0f) * 2f - 1f)
    (width, height, frames, feat)
  }

  /** Decode + feature-extract stage. `batchSize` is the per-call batch
    * the codec sees — the knob a real codec uses to amortize init cost,
    * identical in role to Arrow's batch size for Pandas UDFs. The
    * `decoder` is the pluggable codec ([[StubDecoder]] by default). */
  def extractFeatures(media: Dataset[MediaRecord], partitions: Int = 0,
                      batchSize: Int = 32,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val spread = if (partitions > 0) media.repartition(partitions, col("media_id"))
                 else media
    spread.mapPartitions { it =>
      // grouped() = the batch shape; a real impl hands each batch to the
      // codec in one call (and would reuse a per-partition codec handle).
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = Option(r.content).getOrElse(Array.emptyByteArray)
          val digest = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
          val sha = digest.map("%02x".format(_)).mkString
          val (w, h, f, feat) = decoder.decode(r.kind, bytes, digest)
          MediaFeatures(r.media_id, r.kind, bytes.length.toLong, sha, w, h, f, feat)
        }
      }
    }
  }

  /** Aspect-preserving resize plan: target raster dims fitting
    * `maxSide`, computed in integer arithmetic (metadata stage of a
    * resize — a real impl hands (w, h, new_w, new_h) to the raster
    * kernel). Upscaling is never planned: dims already inside the box
    * pass through. */
  def resizeDims(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                 maxSide: Int): org.apache.spark.sql.Column = {
    val longest = greatest(w, h)
    struct(
      when(longest <= maxSide, w)
        .otherwise(greatest((w * maxSide / longest).cast("int"), lit(1))).as("new_w"),
      when(longest <= maxSide, h)
        .otherwise(greatest((h * maxSide / longest).cast("int"), lit(1))).as("new_h"))
  }

  /** Deterministic frame sampling: `k` frame indices evenly spaced over
    * [0, nFrames) (metadata stage of a frame sampler; a real impl
    * slices the decoded frame batch at these indices). Fewer frames
    * than k → every frame once. */
  def sampleFrameIndices(nFrames: org.apache.spark.sql.Column,
                         k: Int): org.apache.spark.sql.Column =
    when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(array_distinct(transform(sequence(lit(0), lit(k - 1)),
        i => (i * nFrames / k).cast("int"))))

  /** Build a synthetic media table from the `documents` fixture (text
    * bytes as the blob) — exercises the binary plumbing end-to-end
    * without real media files. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime_type"))
      .as[MediaRecord]
  }
}
