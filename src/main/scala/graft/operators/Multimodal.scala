package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio) column plumbing with REAL JDK codecs.
  *
  * Media travels as an opaque `binary` column plus typed metadata; decode /
  * resize / feature-extraction run per-partition over iterator batches (the
  * Scala analog of `mapInPandas`: one JVM-side batch loop, no per-row UDF
  * dispatch, codec state initialized once per partition).
  *
  * Codecs are the JDK's own — `javax.imageio` for PNG/JPEG/GIF/BMP,
  * `javax.sound.sampled` for RIFF/WAVE — no external libraries:
  *   - [[decode]] is metadata-grade: it sniffs the container by magic bytes
  *     and parses HEADERS only (`ImageReader.getWidth/getHeight/getNumImages`,
  *     `AudioSystem.getAudioFileFormat`) — no pixel decode, the right cost
  *     model for a 100 TB metadata pass.
  *   - [[resize]] fully decodes pixels and resamples with an EXACT
  *     nearest-neighbor law (`src_x = dst_x * src_w / dst_w`, integer floor)
  *     before lossless PNG re-encode, so downstream results are
  *     bit-reproducible across JVMs and replayable by an independent oracle.
  *   - [[extractFeatures]] reads real decoded samples and emits an
  *     L2-normalized embedding per modality under ONE exact law — images: a
  *     grid-luminance profile (Long sums of `r+g+b` per grid cell); 16-bit
  *     PCM WAV: a time-windowed energy profile (Long sums of `sample²` per
  *     window) — integer-exact up to the single float boundary the ANN
  *     quantizer ([[Similarity.bruteForceTopKExact]]) already absorbs.
  *
  * Containers the JDK cannot decode (video, unknown formats) and corrupt
  * payloads land on the error channel (`*_ok = false` + message), never a
  * throw: one bad object must not kill a 100 TB job.
  */
object Multimodal {

  case class MediaRow(media_id: Long, mime: String, bytes: Array[Byte])
  case class DecodedMedia(
      media_id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int,
      sample_rate: Int, channels: Int,
      decode_ok: Boolean, error: String)

  private val PngMagic  = Array[Byte](0x89.toByte, 'P', 'N', 'G')
  private val JpegMagic = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
  private val GifMagic  = "GIF8".getBytes("US-ASCII")
  private val BmpMagic  = "BM".getBytes("US-ASCII")
  private val RiffMagic = "RIFF".getBytes("US-ASCII")

  private def startsWith(bytes: Array[Byte], magic: Array[Byte]): Boolean =
    bytes.length >= magic.length && {
      var i = 0
      while (i < magic.length && bytes(i) == magic(i)) i += 1
      i == magic.length
    }

  /** Container kind by magic bytes — never trust the declared mime on a
    * petabyte of crawled media. MP4/ISO-BMFF is identified by the `ftyp`
    * box fourcc at offset 4 (the first box is virtually always ftyp). */
  private[operators] def sniff(bytes: Array[Byte]): String =
    if (startsWith(bytes, PngMagic)) "png"
    else if (startsWith(bytes, JpegMagic)) "jpeg"
    else if (startsWith(bytes, GifMagic)) "gif"
    else if (startsWith(bytes, BmpMagic)) "bmp"
    else if (startsWith(bytes, RiffMagic) && bytes.length >= 12 &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      "wav"
    else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p')
      "mp4"
    else "unknown"

  private def fail(r: MediaRow, msg: String): DecodedMedia =
    DecodedMedia(r.media_id, r.mime, r.bytes.length.toLong, 0, 0, 0, 0, 0,
      decode_ok = false, error = msg)

  /** Header-only image metadata via a real `ImageReader` — width, height and
    * (for animated GIF) the frame count come from the container headers, no
    * pixel decode. */
  private def decodeImageHeader(r: MediaRow, kind: String): DecodedMedia = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(r.bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) fail(r, s"no JDK reader for sniffed $kind payload")
      else {
        val reader = readers.next()
        try {
          reader.setInput(in, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          // allowSearch=true walks the container index; GIF reports every
          // animation frame, single-image formats report 1
          val frames = reader.getNumImages(true)
          DecodedMedia(r.media_id, r.mime, r.bytes.length.toLong,
            w, h, frames, 0, 0, decode_ok = true, error = null)
        } finally reader.dispose()
      }
    } catch {
      case e: Exception => fail(r, s"corrupt $kind: ${e.getClass.getSimpleName}")
    } finally in.close()
  }

  /** WAV metadata via `AudioSystem` header parse: audio frame count,
    * sample rate and channel count (no sample decode). */
  private def decodeWavHeader(r: MediaRow): DecodedMedia =
    try {
      val fmt = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(r.bytes))
      DecodedMedia(r.media_id, r.mime, r.bytes.length.toLong,
        width = 0, height = 0, n_frames = fmt.getFrameLength,
        sample_rate = fmt.getFormat.getSampleRate.toInt,
        channels = fmt.getFormat.getChannels,
        decode_ok = true, error = null)
    } catch {
      case e: Exception => fail(r, s"corrupt wav: ${e.getClass.getSimpleName}")
    }

  /** MP4 / ISO-BMFF (ISO 14496-12) VIDEO METADATA by pure box-tree walk —
    * the JDK ships no MP4 codec, but the container's box structure
    * ([size:u32][fourcc:4][payload]) is public and trivially parseable, so
    * the metadata pass supports video at header cost with zero pixel work:
    * `moov/mvhd` yields the movie timescale + duration (surfaced as
    * `sample_rate` = timescale, `n_frames` = duration in timescale units —
    * the container's own time grid), `moov/trak/tkhd` the presentation
    * width/height (16.16 fixed-point → integer part). Both mvhd/tkhd
    * versions (v0 32-bit, v1 64-bit times) decode. Truncated or
    * moov-less payloads ride the error channel. */
  private def decodeMp4Header(r: MediaRow): DecodedMedia = {
    val bb = java.nio.ByteBuffer.wrap(r.bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def fourcc(off: Int): String =
      new String(r.bytes, off + 4, 4, "US-ASCII")
    // walk the sibling boxes of [from, until); return the payload span of
    // the first box named `name`, or null
    def findBox(from: Int, until: Int, name: String): (Int, Int) = {
      var off = from
      while (off + 8 <= until) {
        val size = bb.getInt(off)
        // size==1 is the 64-bit largesize arm (boxes over 4 GiB); a
        // header-grade walk deliberately does not parse it — reject
        // loudly so the row rides the error channel, never a bad offset
        if (size == 1)
          throw new IllegalArgumentException("largesize (64-bit) box unsupported")
        if (size < 8 || off + size > until)
          throw new IllegalArgumentException(s"bad box size $size")
        if (fourcc(off) == name) return (off + 8, off + size)
        off += size
      }
      null
    }
    try {
      val moov = findBox(0, r.bytes.length, "moov")
      if (moov == null) fail(r, "corrupt mp4: no moov box")
      else {
        val mvhd = findBox(moov._1, moov._2, "mvhd")
        if (mvhd == null) fail(r, "corrupt mp4: no mvhd box")
        else {
          val v = bb.get(mvhd._1) & 0xFF
          val (timescale, duration) =
            if (v == 1) (bb.getInt(mvhd._1 + 20), bb.getLong(mvhd._1 + 24))
            else (bb.getInt(mvhd._1 + 12),
              // v0 duration is an UNSIGNED 32-bit word
              bb.getInt(mvhd._1 + 16).toLong & 0xFFFFFFFFL)
          // n_frames is a 32-bit column: a v1 64-bit (or v0 unsigned
          // > Int.MaxValue) duration must error-channel, not silently
          // wrap to a wrong/negative count — and a corrupt v1 duration
          // with the sign bit set is negative, not merely large
          if (duration > Int.MaxValue || duration < 0)
            return fail(r, s"mp4 duration $duration exceeds 32-bit range")
          var (w, h) = (0, 0)
          val trak = findBox(moov._1, moov._2, "trak")
          if (trak != null) {
            val tkhd = findBox(trak._1, trak._2, "tkhd")
            if (tkhd != null) {
              val tv = bb.get(tkhd._1) & 0xFF
              val dims = tkhd._1 + (if (tv == 1) 88 else 76)
              w = bb.getInt(dims) >>> 16     // 16.16 fixed point
              h = bb.getInt(dims + 4) >>> 16
            }
          }
          DecodedMedia(r.media_id, r.mime, r.bytes.length.toLong,
            width = w, height = h, n_frames = duration.toInt,
            sample_rate = timescale, channels = 0,
            decode_ok = true, error = null)
        }
      }
    } catch {
      case e: Exception =>
        fail(r, s"corrupt mp4: ${e.getClass.getSimpleName}")
    }
  }

  /** Decode a media Dataset per-partition (batch loop, codec state reused
    * across the partition). Metadata-grade: headers only. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init: no disk-backed ImageIO scratch files on
      // executors — decode streams stay on-heap
      ImageIO.setUseCache(false)
      rows.map { r =>
        if (r.bytes.isEmpty) fail(r, "empty payload")
        else sniff(r.bytes) match {
          case "wav" => decodeWavHeader(r)
          case "mp4" => decodeMp4Header(r)
          case "unknown" => fail(r, "unrecognized container (magic bytes)")
          case kind => decodeImageHeader(r, kind)
        }
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
          .when(hex(substring(col(bytesCol), 1, 4)) === "47494638", "image/gif")
          .when(hex(substring(col(bytesCol), 1, 4)) === "52494646", "audio/wav")
          .otherwise("application/octet-stream"))

  /** Frame/sample-index sampling plan: explode a deterministic index list
    * (every `stride`-th frame of an animation, or every `stride`-th audio
    * frame) so downstream per-frame work distributes. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .where(col("decode_ok") && col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))

  /** Full pixel decode via `ImageIO.read`; null (unsupported) and throw
    * (corrupt) both fold to None. */
  private def readPixels(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** EXACT nearest-neighbor resample: destination pixel (x, y) takes source
    * pixel (x*sw/tw, y*sh/th), integer floor — a fixed public law (vs the
    * platform-dependent rounding of `Graphics2D.drawImage` scaling) so the
    * output is bit-identical across JVMs and independently replayable. */
  private[operators] def nearestNeighbor(
      src: BufferedImage, tw: Int, th: Int): BufferedImage = {
    val sw = src.getWidth
    val sh = src.getHeight
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      val sy = y * sh / th
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, src.getRGB(x * sw / tw, sy) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    out
  }

  case class ResizedMedia(media_id: Long, mime: String,
      target_w: Int, target_h: Int, resized_bytes: Array[Byte],
      resize_ok: Boolean, error: String)

  /** Resize pass: real `ImageIO` pixel decode → exact nearest-neighbor
    * resample → lossless PNG re-encode, per-partition batch loop with the
    * target dims closed over. Non-image and corrupt payloads ride the error
    * channel. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        if (r.bytes.isEmpty)
          ResizedMedia(r.media_id, r.mime, targetW, targetH,
            Array.empty[Byte], resize_ok = false, error = "empty payload")
        else readPixels(r.bytes) match {
          case None =>
            ResizedMedia(r.media_id, r.mime, targetW, targetH,
              Array.empty[Byte], resize_ok = false,
              error = s"not a decodable image (sniffed ${sniff(r.bytes)})")
          case Some(src) =>
            val out = new ByteArrayOutputStream(targetW * targetH / 4)
            ImageIO.write(nearestNeighbor(src, targetW, targetH), "png", out)
            ResizedMedia(r.media_id, r.mime, targetW, targetH, out.toByteArray,
              resize_ok = true, error = null)
        }
      }
    }
  }

  /** Per-cell luminance sums of a `grid`×`grid` partition of the image —
    * cell (cy, cx) covers x in [cx*w/grid, (cx+1)*w/grid) (same floor law as
    * the resampler) and sums `r+g+b` over its pixels as exact Longs. */
  private[graft] def gridLuminance(img: BufferedImage, grid: Int): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sums(cy * grid + x * grid / w) +=
          ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    sums
  }

  /** Per-window PCM energy sums of a 16-bit WAV — the audio analog of
    * [[gridLuminance]]: frame f lands in window `f·dim/frames` (the same
    * integer-floor partition law as the pixel grid) and contributes
    * `sample²` per channel as an exact Long. Only PCM_SIGNED 16-bit payloads
    * qualify (the RIFF/WAVE norm); anything else → None (error channel). */
  private[graft] def audioEnergy(bytes: Array[Byte], dim: Int): Option[Array[Long]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val channels = fmt.getChannels
          val frameSize = fmt.getFrameSize // channels × 2 bytes
          val data = in.readAllBytes()
          val frames = data.length / frameSize
          if (frames == 0) None
          else {
            val bb = java.nio.ByteBuffer.wrap(data).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val sums = new Array[Long](dim)
            var f = 0
            while (f < frames) {
              // Long multiply: f*dim overflows Int past ~2^31/dim frames
              // (a valid mono WAV over ~268 MB), yielding a negative
              // window index misreported as a decode failure
              val w = (f.toLong * dim / frames).toInt
              var c = 0
              while (c < channels) {
                val s = bb.getShort(f * frameSize + c * 2).toLong
                sums(w) += s * s
                c += 1
              }
              f += 1
            }
            Some(sums)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  case class MediaFeatures(media_id: Long, mime: String,
      embedding: Array[Float], feature_ok: Boolean, error: String)

  /** One sampled video frame's exact grid-luminance sums — the FRAME grain
    * of the video feature path (one row per (video, sampled frame), so
    * per-frame work distributes and frames can feed ANN/dedup directly). */
  case class VideoFrameFeatures(media_id: Long, mime: String, frame_idx: Int,
      n_frames: Int, cell_sums: Array[Long], feature_ok: Boolean,
      error: String)

  private def domChild(e: org.w3c.dom.Node,
      name: String): Option[org.w3c.dom.Element] = {
    var c = e.getFirstChild
    while (c != null) {
      if (c.getNodeName == name) return Some(c.asInstanceOf[org.w3c.dom.Element])
      c = c.getNextSibling
    }
    None
  }

  private def attrInt(e: org.w3c.dom.Element, name: String): Int = {
    val v = e.getAttribute(name)
    if (v == null || v.isEmpty) 0 else v.toInt
  }

  /** Decode every `stride`-th frame of a multi-frame image container
    * (animated GIF — the JDK's only multi-frame decoder) and apply `f`
    * to it. The reader is opened ONCE per payload; header cost is not
    * re-paid per frame. Frames must be FULL, OPAQUE canvas repaints — the
    * feature law sums what one frame shows, so any animation that needs
    * compositing with earlier frames routes the whole payload to the
    * error channel. Three metadata-only checks (no decode), each catching
    * a real encoder shape:
    *
    *   1. frame 0 vs the LOGICAL SCREEN descriptor — a first frame
    *      smaller than the declared canvas already composites against
    *      background;
    *   2. every frame's dimensions vs frame 0's — sub-canvas delta frames
    *      (and a nonzero ImageDescriptor offset, which can pair with
    *      full-size dims);
    *   3. every frame AFTER 0 with a GIF GraphicControlExtension
    *      transparent-color flag — the common encoder shape the dimension
    *      check misses: FULL-canvas delta frames whose unchanged pixels
    *      are transparent holes over the previous frame (usually with
    *      'doNotDispose'), which would decode as black and silently
    *      corrupt the grid sums.
    *
    * Every frame is inspected, not just the sampled ones: a delta frame
    * falling between strides still proves the animation composites, which
    * makes the frames we DO sample wrong too. A container the JDK cannot
    * read yields Left(error). */
  private def mapSampledFrames[A](bytes: Array[Byte], stride: Int)(
      f: (Int, Int, BufferedImage) => A): Either[String, Seq[A]] = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) Left(s"no JDK reader (sniffed ${sniff(bytes)})")
      else {
        val reader = readers.next()
        try {
          reader.setInput(in, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ false)
          val n = reader.getNumImages(true)
          val idxs = 0 until n by stride
          def screenIssue: Option[String] = {
            val sm = reader.getStreamMetadata
            if (sm == null || !sm.getMetadataFormatNames
                .contains("javax_imageio_gif_stream_1.0")) None
            else domChild(sm.getAsTree("javax_imageio_gif_stream_1.0"),
              "LogicalScreenDescriptor").flatMap { l =>
              val (w, h) = (attrInt(l, "logicalScreenWidth"),
                attrInt(l, "logicalScreenHeight"))
              if (w > 0 && h > 0 &&
                  (w != reader.getWidth(0) || h != reader.getHeight(0)))
                Some(s"frame 0 ${reader.getWidth(0)}x${reader.getHeight(0)}" +
                  s" differs from logical screen ${w}x$h: canvas " +
                  "compositing needed")
              else None
            }
          }
          def subIssue: Option[String] = (0 until n).collectFirst {
            case i if reader.getWidth(i) != reader.getWidth(0) ||
                reader.getHeight(i) != reader.getHeight(0) =>
              s"sub-canvas frame $i " +
                s"(${reader.getWidth(i)}x${reader.getHeight(i)} vs canvas " +
                s"${reader.getWidth(0)}x${reader.getHeight(0)}): offset/" +
                "disposal animation needs canvas compositing"
          }
          def gifFrameIssue: Option[String] = (0 until n).iterator.map { i =>
            val md = reader.getImageMetadata(i)
            if (md == null || !md.getMetadataFormatNames
                .contains("javax_imageio_gif_image_1.0")) None
            else {
              val root = md.getAsTree("javax_imageio_gif_image_1.0")
              val off = domChild(root, "ImageDescriptor").map(d =>
                (attrInt(d, "imageLeftPosition"),
                  attrInt(d, "imageTopPosition"))).getOrElse((0, 0))
              val gce = domChild(root, "GraphicControlExtension")
              if (off != ((0, 0)))
                Some(s"frame $i at offset $off: offset/disposal " +
                  "animation needs canvas compositing")
              else if (i > 0 && gce.exists(_.getAttribute(
                  "transparentColorFlag").equalsIgnoreCase("true")))
                Some(s"frame $i is a transparent full-canvas delta " +
                  s"(${gce.map(_.getAttribute("disposalMethod"))
                    .getOrElse("?")} disposal): unchanged pixels are " +
                  "holes over the previous frame")
              else None
            }
          }.collectFirst { case Some(msg) => msg }
          screenIssue.orElse(subIssue).orElse(gifFrameIssue) match {
            case Some(msg) => Left(msg)
            case None => Right(idxs.map(i => f(i, n, reader.read(i))))
          }
        } catch {
          case e: Exception => Left(s"corrupt container: ${e.getClass.getSimpleName}")
        } finally reader.dispose()
      }
    } finally in.close()
  }

  /** Frame-grain video features: every `stride`-th frame of each video
    * yields one row of EXACT `√dim×√dim` grid-luminance Long sums
    * ([[gridLuminance]] — the same integer-floor law as the stills).
    * Map-only per-partition batch loop; the per-video fan-out is
    * `ceil(n_frames/stride)` rows, so a long video distributes its frame
    * work across downstream stages instead of hiding it in one task's
    * loop. Undecodable payloads ride the error channel as one row. */
  def videoFrameFeatures(media: Dataset[MediaRow], dim: Int = 16,
      stride: Int = 2): Dataset[VideoFrameFeatures] = {
    val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"dim must be a perfect square, got $dim")
    require(stride > 0, "stride must be positive")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.bytes.isEmpty)
        Seq(VideoFrameFeatures(r.media_id, r.mime, -1, 0,
          Array.empty[Long], feature_ok = false, error = "empty payload"))
      else mapSampledFrames(r.bytes, stride) { (idx, n, img) =>
        VideoFrameFeatures(r.media_id, r.mime, idx, n,
          gridLuminance(img, grid), feature_ok = true, error = null)
      } match {
        case Right(rows) if rows.nonEmpty => rows
        // a container the reader accepts but that yields no frames still
        // lands ONE verdict row — a payload must never vanish from
        // downstream counts
        case Right(_) =>
          Seq(VideoFrameFeatures(r.media_id, r.mime, -1, 0,
            Array.empty[Long], feature_ok = false, error = "no frames"))
        case Left(err) =>
          Seq(VideoFrameFeatures(r.media_id, r.mime, -1, 0,
            Array.empty[Long], feature_ok = false, error = err))
      }
    }
  }

  /** Media-grain video embedding: the exact Long cell sums of every
    * `stride`-th frame SUM across the sampled frames (still the one
    * non-negative-Long-sums-then-normalize law every modality shares), so
    * video rows compose with the ANN/dedup operators exactly like image
    * and audio rows. */
  def videoFeatures(media: Dataset[MediaRow], dim: Int = 16,
      stride: Int = 2): Dataset[MediaFeatures] = {
    val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"dim must be a perfect square, got $dim")
    require(stride > 0, "stride must be positive")
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.bytes.isEmpty)
        MediaFeatures(r.media_id, r.mime, Array.empty[Float],
          feature_ok = false, error = "empty payload")
      else mapSampledFrames(r.bytes, stride)(
        (_, _, img) => gridLuminance(img, grid)) match {
        case Right(frameSums) if frameSums.nonEmpty =>
          val total = new Array[Long](dim)
          frameSums.foreach { sums =>
            var j = 0
            while (j < dim) { total(j) += sums(j); j += 1 }
          }
          MediaFeatures(r.media_id, r.mime, normalized(total),
            feature_ok = true, error = null)
        case Right(_) =>
          MediaFeatures(r.media_id, r.mime, Array.empty[Float],
            feature_ok = false, error = "no frames")
        case Left(err) =>
          MediaFeatures(r.media_id, r.mime, Array.empty[Float],
            feature_ok = false, error = err)
      }
    }
  }

  private def normalized(sums: Array[Long]): Array[Float] = {
    val norm = math.sqrt(sums.map(s => s.toDouble * s.toDouble).sum)
    if (norm == 0) sums.map(_.toFloat) else sums.map(s => (s / norm).toFloat)
  }

  /** Feature-extraction over REAL decoded samples, one embedding space per
    * modality under the same exact law (non-negative Long sums over an
    * integer-floor partition → L2-normalize):
    *   - images: √dim × √dim grid-luminance cells, Σ(r+g+b) per cell
    *     ([[gridLuminance]]; `dim` must be a square);
    *   - 16-bit PCM WAV: `dim` time windows, Σ sample² per window over all
    *     channels ([[audioEnergy]] — the energy/RMS profile).
    * Embeddings compose with the ANN operators ([[Similarity]]) and dedup
    * ([[Dedup.cosineDupPairs]]); the only float boundary is the final
    * normalize, which the ANN quantizer absorbs. Non-decodable payloads
    * ride the error channel. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val grid = math.sqrt(dim.toDouble).toInt
    require(grid * grid == dim, s"dim must be a perfect square, got $dim")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        if (r.bytes.isEmpty)
          MediaFeatures(r.media_id, r.mime, Array.empty[Float],
            feature_ok = false, error = "empty payload")
        else if (sniff(r.bytes) == "wav") audioEnergy(r.bytes, dim) match {
          case Some(sums) =>
            MediaFeatures(r.media_id, r.mime, normalized(sums),
              feature_ok = true, error = null)
          case None =>
            MediaFeatures(r.media_id, r.mime, Array.empty[Float],
              feature_ok = false, error = "not a decodable 16-bit PCM wav")
        }
        else readPixels(r.bytes) match {
          case None =>
            MediaFeatures(r.media_id, r.mime, Array.empty[Float],
              feature_ok = false,
              error = s"not a decodable image (sniffed ${sniff(r.bytes)})")
          case Some(img) =>
            MediaFeatures(r.media_id, r.mime,
              normalized(gridLuminance(img, grid)),
              feature_ok = true, error = null)
        }
      }
    }
  }
}
