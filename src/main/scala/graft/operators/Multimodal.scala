package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travels as an opaque `binary` column plus typed metadata; decode /
  * feature-extraction runs per-partition over iterator batches (the Scala
  * analog of `mapInPandas`: one JVM-side batch loop, no per-row UDF dispatch,
  * library handles loaded once per partition).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `FakeDecoder` derives deterministic pseudo-metadata from the
  * bytes. The Spark-side contract — schema, batch shape, partitioning,
  * null/error channel — is real and tested; swap `FakeDecoder` for a JNI/
  * javacv decoder in production.
  */
object Multimodal {

  case class MediaRow(media_id: Long, mime: String, bytes: Array[Byte])
  case class DecodedMedia(
      media_id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int,
      decode_ok: Boolean, error: String)

  /** STUB decoder: deterministic fake dimensions derived from content bytes.
    * Replace with a real codec; the signature (bytes → metadata or error) and
    * the per-partition batch loop are the production shape. */
  object FakeDecoder {
    def decode(mime: String, bytes: Array[Byte]): DecodedMedia = {
      val h = graft.codec.Hashes.fnv64a(bytes)
      val abs = h & Long.MaxValue
      if (bytes.isEmpty)
        DecodedMedia(-1, mime, 0, 0, 0, 0, decode_ok = false, error = "empty payload")
      else
        DecodedMedia(-1, mime, bytes.length.toLong,
          width = (abs % 1920 + 1).toInt,
          height = ((abs >> 16) % 1080 + 1).toInt,
          n_frames = if (mime.startsWith("video")) ((abs >> 32) % 300 + 1).toInt else 1,
          decode_ok = true, error = null)
    }
  }

  /** Decode a media Dataset per-partition (batch loop, codec state reused
    * across the partition — the mapInPandas-shaped plumbing). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder/codec handles, model weights…)
      rows.map { r =>
        FakeDecoder.decode(r.mime, r.bytes).copy(media_id = r.media_id)
      }
    }
  }

  /** Column-level metadata that needs no codec: byte length, content hash,
    * magic-byte sniffing — pure expressions, stay in codegen. */
  def binaryMetadata(df: DataFrame, bytesCol: String): DataFrame =
    df
      .withColumn("byte_len", length(col(bytesCol)).cast("long"))
      .withColumn("content_sha256", sha2(col(bytesCol), 256))
      .withColumn("sniffed_mime",
        when(hex(substring(col(bytesCol), 1, 3)) === "FFD8FF", "image/jpeg")
          .when(hex(substring(col(bytesCol), 1, 4)) === "89504E47", "image/png")
          .when(hex(substring(col(bytesCol), 1, 4)) === "52494646", "audio/wav")
          .otherwise("application/octet-stream"))

  /** Frame-sampling plan for video rows: explode a deterministic frame index
    * list (every `stride`-th frame) so downstream per-frame work distributes. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .where(col("decode_ok") && col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))

  case class ResizedMedia(media_id: Long, mime: String,
      target_w: Int, target_h: Int, resized_bytes: Array[Byte],
      resize_ok: Boolean, error: String)

  /** Resize pass (STUB codec, real plumbing): per-partition batch loop with
    * the target dims closed over — the production shape for a JNI/javacv
    * scaler whose handles load once per partition. The stub emits a
    * deterministic payload (sha-256 of input ‖ dims) with a plausible
    * compressed size so downstream sizing logic is exercised. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: scaler context, pinned buffers…
      rows.map { r =>
        if (r.bytes.isEmpty)
          ResizedMedia(r.media_id, r.mime, targetW, targetH,
            Array.empty[Byte], resize_ok = false, error = "empty payload")
        else {
          val seed = graft.codec.Hashes.sha256(
            r.bytes ++ s":$targetW:$targetH".getBytes("UTF-8"))
          // stub payload: seed repeated to ~w*h/8 bytes (a plausible
          // compressed size), deterministic for specs
          val len = math.max(32, targetW * targetH / 8)
          val out = Array.tabulate[Byte](len)(i => seed(i % seed.length))
          ResizedMedia(r.media_id, r.mime, targetW, targetH, out,
            resize_ok = true, error = null)
        }
      }
    }
  }

  case class MediaFeatures(media_id: Long, mime: String,
      embedding: Array[Float], feature_ok: Boolean, error: String)

  /** Feature-extraction pass (STUB model, real plumbing): per-partition
    * batch loop — where a real deployment loads model weights once per
    * partition and runs batched inference. The stub derives a
    * deterministic unit-norm embedding from a sha-256 chain over the
    * bytes, so the output composes with the ANN operators
    * ([[Similarity]]) and dedup ([[Dedup.cosineDupPairs]]) in specs. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: model weights, inference session…
      rows.map { r =>
        if (r.bytes.isEmpty)
          MediaFeatures(r.media_id, r.mime, Array.empty[Float],
            feature_ok = false, error = "empty payload")
        else {
          val raw = Array.tabulate(dim) { d =>
            val h = graft.codec.Hashes.sha256(
              r.bytes ++ s":f$d".getBytes("UTF-8"))
            // first 4 bytes → int → [-1, 1]
            val x = ((h(0) & 0xFF) << 24) | ((h(1) & 0xFF) << 16) |
              ((h(2) & 0xFF) << 8) | (h(3) & 0xFF)
            x.toFloat / Int.MaxValue.toFloat
          }
          val norm = math.sqrt(raw.map(x => x.toDouble * x).sum)
          val emb = if (norm == 0) raw else raw.map(x => (x / norm).toFloat)
          MediaFeatures(r.media_id, r.mime, emb, feature_ok = true, error = null)
        }
      }
    }
  }
}
