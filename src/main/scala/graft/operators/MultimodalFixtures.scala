package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Deterministic REAL media fixtures for the multimodal catalog queries.
  *
  * Every payload is a genuine container (PNG/JPEG/GIF via `javax.imageio`,
  * RIFF/WAVE PCM hand-assembled per the public RIFF layout) whose ground
  * truth — dimensions, frame counts, every pixel of the PNGs — is a pure
  * integer formula of `media_id`. The DuckDB oracles re-derive that formula
  * independently (`tools/golden_multimodal.py` replays the pixel law, the
  * exact nearest-neighbor resample law and the grid-luminance law in
  * numpy), so a hash match proves the JDK codec path reproduced the planted
  * media exactly — encode → decode → resample → pixel read, end to end.
  *
  * Pixel law of the pattern PNGs (lossless, so decode returns it exactly):
  *   r(x,y) = (x*7  + y*13 + i*31) mod 256
  *   g(x,y) = (x*11 + y*3  + i*17) mod 256
  *   b(x,y) = (x*5  + y*19 + i*41) mod 256
  * with  w = 16 + (i mod 7)*8,  h = 16 + (i mod 5)*8.
  */
object MultimodalFixtures {

  def patternWidth(i: Long): Int = 16 + (i % 7).toInt * 8
  def patternHeight(i: Long): Int = 16 + (i % 5).toInt * 8

  def patternImage(i: Long): BufferedImage = {
    val w = patternWidth(i)
    val h = patternHeight(i)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 7 + y * 13 + i * 31) % 256
        val g = (x * 11 + y * 3 + i * 17) % 256
        val b = (x * 5 + y * 19 + i * 41) % 256
        img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b.toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  def patternPng(i: Long): Array[Byte] = encode(patternImage(i), "png")

  /** Solid-color JPEG — lossy, so only the DIMENSIONS are oracle-checked. */
  def solidJpeg(i: Long): Array[Byte] = {
    val w = patternWidth(i)
    val h = patternHeight(i)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (((i * 37) % 256).toInt << 16) | (((i * 59) % 256).toInt << 8) |
      ((i * 83) % 256).toInt
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    encode(img, "jpg")
  }

  /** Animated GIF with `2 + (i mod 4)` frames, written with the JDK's GIF
    * `ImageWriter` sequence API — exercises the multi-frame
    * `getNumImages(true)` arm of [[Multimodal.decode]]. */
  def animatedGif(i: Long): Array[Byte] = {
    val frames = gifFrames(i)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(patternImage(i + f), null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  def gifFrames(i: Long): Int = 2 + (i % 4).toInt

  /** Animated GIF whose SECOND frame is a smaller sub-canvas delta frame —
    * the real-world offset/disposal animation shape. The feature law only
    * holds for full-canvas frames, so this payload must ride the error
    * channel (a grid sum over the sub-frame would be a silently wrong
    * embedding, not a smaller one). */
  def subCanvasGif(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      writer.writeToSequence(
        new javax.imageio.IIOImage(patternImage(i), null, null), null)
      val small = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      writer.writeToSequence(
        new javax.imageio.IIOImage(small, null, null), null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Animated GIF whose SECOND frame is FULL-CANVAS but carries a GIF
    * GraphicControlExtension with the transparent-color flag and
    * doNotDispose disposal — the common encoder delta shape that PASSES a
    * dimensions-only guard: unchanged pixels are transparent holes over
    * the previous frame, so a per-frame grid sum silently reads them as
    * black. The metadata guard must route it to the error channel. */
  def transparentDeltaGif(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      writer.writeToSequence(
        new javax.imageio.IIOImage(patternImage(i), null, null), null)
      // second frame: same canvas size, but write per-frame metadata
      // declaring a transparent color + doNotDispose (the delta law)
      val frame2 = new BufferedImage(patternImage(i).getWidth,
        patternImage(i).getHeight, BufferedImage.TYPE_BYTE_INDEXED)
      val spec = javax.imageio.ImageTypeSpecifier
        .createFromRenderedImage(frame2)
      val md = writer.getDefaultImageMetadata(spec, null)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = md.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = {
        var c = root.getFirstChild
        while (c != null && c.getNodeName != "GraphicControlExtension")
          c = c.getNextSibling
        if (c != null) c.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val n = new javax.imageio.metadata
            .IIOMetadataNode("GraphicControlExtension")
          root.appendChild(n)
          n
        }
      }
      gce.setAttribute("disposalMethod", "doNotDispose")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "TRUE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      md.setFromTree(fmt, root)
      writer.writeToSequence(
        new javax.imageio.IIOImage(frame2, null, md), null)
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  def wavFrames(i: Long): Int = 1000 + i.toInt * 10
  def wavChannels(i: Long): Int = 1 + (i % 2).toInt
  val WavSampleRate = 8000

  /** The planted PCM sample law: sample(media i, frame f, channel c) is a
    * pure integer formula in 16-bit range — the audio analog of the pattern
    * pixel law, so an independent oracle re-derives every sample without an
    * audio library. */
  def wavSample(i: Long, f: Int, c: Int): Short =
    (((i * 31 + f * 7 + c * 13) % 2001) - 1000).toShort

  /** Minimal valid RIFF/WAVE: 16-bit PCM header + the [[wavSample]] formula
    * tone, assembled per the public RIFF layout (44-byte canonical
    * header). */
  def wavBytes(i: Long): Array[Byte] = {
    val channels = wavChannels(i)
    val frames = wavFrames(i)
    val bytesPerFrame = channels * 2
    val dataLen = frames * bytesPerFrame
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(WavSampleRate)
    buf.putInt(WavSampleRate * bytesPerFrame) // byte rate
    buf.putShort(bytesPerFrame.toShort)       // block align
    buf.putShort(16.toShort)                  // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) { buf.putShort(wavSample(i, f, c)); c += 1 }
      f += 1
    }
    buf.array()
  }

  /** Valid magic bytes, body cut off mid-header — the corrupt-image arm. */
  def truncatedPng(i: Long): Array[Byte] = patternPng(i).take(16)

  // ---- MP4 / ISO-BMFF (video metadata) --------------------------------------

  def mp4Timescale(i: Long): Int = 600 + i.toInt
  def mp4Duration(i: Long): Int = 9000 + 10 * i.toInt
  def mp4Width(i: Long): Int = 320 + 16 * (i % 4).toInt
  def mp4Height(i: Long): Int = 240 + 8 * (i % 5).toInt

  /** Minimal valid ISO-BMFF tree assembled per the public box layout
    * (ISO 14496-12): `ftyp` ‖ `moov(mvhd, trak(tkhd))` — v0 boxes, movie
    * timescale/duration in mvhd, presentation dims (16.16 fixed) in tkhd.
    * No media data: the metadata pass never needs an mdat. */
  def mp4Bytes(i: Long): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
        "isom".getBytes("US-ASCII"))
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(0)                       // version 0 + flags
      b.putInt(0).putInt(0)             // ctime, mtime
      b.putInt(mp4Timescale(i))
      b.putInt(mp4Duration(i))
      b.putInt(0x00010000)              // rate 1.0
      b.putShort(0x0100.toShort)        // volume 1.0
      b.position(b.position() + 10)     // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)              // identity matrix
      b.position(b.position() + 24)     // pre_defined
      b.putInt(2)                       // next_track_ID
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      b.putInt(7)                       // version 0 + flags (enabled|in movie)
      b.putInt(0).putInt(0)             // ctime, mtime
      b.putInt(1)                       // track_ID
      b.putInt(0)                       // reserved
      b.putInt(mp4Duration(i))
      b.position(b.position() + 8)      // reserved
      b.putShort(0).putShort(0)         // layer, alternate_group
      b.putShort(0).putShort(0)         // volume (video: 0), reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)              // identity matrix
      b.putInt(mp4Width(i) << 16)       // 16.16 fixed
      b.putInt(mp4Height(i) << 16)
      box("tkhd", b.array())
    }
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** Valid ftyp magic, tree cut mid-moov — the corrupt-video arm. */
  def truncatedMp4(i: Long): Array[Byte] = mp4Bytes(i).take(40)

  /** The video-metadata fixture law: media_id mod 3 selects the arm.
    * 0 → valid MP4, 1 → truncated MP4 (corrupt), 2 → WAV (cross-modality
    * contrast in the same frame). */
  def videoMetaRow(i: Long): Multimodal.MediaRow = (i % 3) match {
    case 0 => Multimodal.MediaRow(i, "video/mp4", mp4Bytes(i))
    case 1 => Multimodal.MediaRow(i, "video/mp4", truncatedMp4(i))
    case _ => Multimodal.MediaRow(i, "audio/wav", wavBytes(i))
  }

  /** The decode-catalog fixture law: media_id mod 6 selects the container.
    * 0 → pattern PNG, 1 → solid JPEG, 2 → animated GIF, 3 → WAV,
    * 4 → unrecognized bytes, 5 → truncated PNG. */
  def decodeRow(i: Long): Multimodal.MediaRow = (i % 6) match {
    case 0 => Multimodal.MediaRow(i, "image/png", patternPng(i))
    case 1 => Multimodal.MediaRow(i, "image/jpeg", solidJpeg(i))
    case 2 => Multimodal.MediaRow(i, "image/gif", animatedGif(i))
    case 3 => Multimodal.MediaRow(i, "audio/wav", wavBytes(i))
    case 4 => Multimodal.MediaRow(i, "application/octet-stream",
      s"not-a-media-payload-$i".getBytes("UTF-8"))
    case _ => Multimodal.MediaRow(i, "image/png", truncatedPng(i))
  }

  /** The pipeline fixture law: media_id mod 5 → 0..2 pattern PNG (the rows
    * that survive to the ANN), 3 WAV (dropped at the resize gate), 4
    * unrecognized bytes (dropped at the decode gate). */
  def pipelineRow(i: Long): Multimodal.MediaRow = (i % 5) match {
    case 3 => Multimodal.MediaRow(i, "audio/wav", wavBytes(i))
    case 4 => Multimodal.MediaRow(i, "application/octet-stream",
      s"not-a-media-payload-$i".getBytes("UTF-8"))
    case _ => Multimodal.MediaRow(i, "image/png", patternPng(i))
  }

  // ---- GIF-as-video (frame-grain features) ----------------------------------

  def videoWidth(i: Long): Int = 16 + (i % 4).toInt * 8
  def videoHeight(i: Long): Int = 16 + (i % 3).toInt * 8
  def videoFrameCount(i: Long): Int = 3 + (i % 3).toInt // 3..5 frames

  /** Planted 256-entry palette of video i (same modulus family as the
    * pattern stills, keyed by PALETTE INDEX rather than pixel). */
  def videoPaletteR(i: Long, p: Int): Int = ((p * 7 + i * 31) % 256).toInt
  def videoPaletteG(i: Long, p: Int): Int = ((p * 11 + i * 17) % 256).toInt
  def videoPaletteB(i: Long, p: Int): Int = ((p * 5 + i * 41) % 256).toInt

  /** Planted pixel-INDEX law of frame f — the frame number shifts the
    * pattern so every frame is distinct and the frame-sampling stride is
    * oracle-visible. */
  def videoPixelIndex(i: Long, f: Int, x: Int, y: Int): Int =
    ((x * 3 + y * 5 + f * 29 + i * 13) % 256).toInt

  /** One INDEXED-COLOR frame. GIF is palette-based: a truecolor pattern
    * still would be quantized by the writer (lossy, not oracle-replayable),
    * but an image that already carries an 8-bit IndexColorModel round-trips
    * its palette and indices verbatim — every decoded pixel stays a pure
    * formula of (i, f, x, y). */
  def videoFrameImage(i: Long, f: Int): BufferedImage = {
    val w = videoWidth(i)
    val h = videoHeight(i)
    val rs = Array.tabulate(256)(p => videoPaletteR(i, p).toByte)
    val gs = Array.tabulate(256)(p => videoPaletteG(i, p).toByte)
    val bs = Array.tabulate(256)(p => videoPaletteB(i, p).toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, rs, gs, bs)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, videoPixelIndex(i, f, x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  /** GIF-as-video: an animated GIF of [[videoFrameCount]] full-size
    * indexed frames (no offsets, no disposal tricks) — the JDK-decodable
    * stand-in for a video container, exercising the real multi-frame
    * `ImageReader` path at the frame grain. */
  def videoGif(i: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < videoFrameCount(i)) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(videoFrameImage(i, f), null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** The pipeline-v2 fixture law (all three feature modalities + both drop
    * gates): media_id mod 6 → 0,1 pattern PNG (resize→features), 2
    * GIF-as-video (frame-sampled video features), 3 WAV (audio features),
    * 4 unrecognized bytes (dropped at the decode gate), 5 truncated PNG
    * (dropped at the decode gate). */
  def pipelineV2Row(i: Long): Multimodal.MediaRow = (i % 6) match {
    case 2 => Multimodal.MediaRow(i, "video/gif", videoGif(i))
    case 3 => Multimodal.MediaRow(i, "audio/wav", wavBytes(i))
    case 4 => Multimodal.MediaRow(i, "application/octet-stream",
      s"not-a-media-payload-$i".getBytes("UTF-8"))
    case 5 => Multimodal.MediaRow(i, "image/png", truncatedPng(i))
    case _ => Multimodal.MediaRow(i, "image/png", patternPng(i))
  }
}
