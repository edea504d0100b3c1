package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL media codecs on the pure JDK — no external image/audio libraries:
  * PNG via javax.imageio (headless raster ops only, no display system) and
  * WAV/PCM16 via a hand parse of the RIFF layout (public container spec).
  * These replace the round-2 "honest stub" bodies in [[Multimodal]]; the
  * byte-histogram stub survives as the q22 DuckDB-twin path (a histogram
  * is the one feature SQL can recompute), while the decode paths below are
  * gated by analytic invariants (q44) and MultimodalCodecSpec.
  */
object MediaCodecs {

  // executors have no display; raster codecs only need headless awt
  System.setProperty("java.awt.headless", "true")

  // ------------------------------------------------------------------
  // PNG (javax.imageio)
  // ------------------------------------------------------------------

  /** Deterministic synthetic image: a seeded RGB gradient-with-noise
    * pattern (doc-id-reproducible across partitionings and JVMs).
    */
  def syntheticImage(width: Int, height: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // xorshift-mixed deterministic pixel
        var h = seed * 31 + y.toLong * width + x
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        val r = ((x * 255) / math.max(width - 1, 1)) & 0xff
        val g = ((y * 255) / math.max(height - 1, 1)) & 0xff
        val b = (h & 0xff).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    // write returns FALSE (no exception) when no PNG writer is registered —
    // surface that here, not later as a misleading decode failure
    require(ImageIO.write(img, "png", bos), "no PNG ImageWriter registered in this JVM")
    bos.toByteArray
  }

  /** Real PNG decode; throws on a non-image payload (callers surface
    * corrupt media as errors, not plausible features).
    */
  def decodePng(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) throw new IllegalArgumentException("payload is not a decodable image")
    img
  }

  /** Pure-raster nearest-neighbor resize (no Graphics2D, no font/display
    * machinery) — the thumbnail op of an ingest pipeline.
    */
  def resizeNearest(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.getHeight / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.getWidth / w).toInt
        out.setRGB(x, y, img.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Pooled pixel statistics — 8 floats:
    * [meanR, meanG, meanB, stdLuma, width, height, aspect, edgeEnergy]
    * (means/std in [0,1]; edgeEnergy = mean |horizontal luma delta|).
    */
  def imageFeatures(img: BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var sl = 0.0; var sl2 = 0.0; var edge = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      var prevLuma = 0.0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff
        val g = (p >> 8) & 0xff
        val b = p & 0xff
        val luma = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b
        sl += luma; sl2 += luma * luma
        if (x > 0) edge += math.abs(luma - prevLuma)
        prevLuma = luma
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val meanL = sl / n
    val varL = math.max(sl2 / n - meanL * meanL, 0.0)
    Array(
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
      (math.sqrt(varL) / 255.0).toFloat,
      w.toFloat, h.toFloat, (w.toDouble / h).toFloat,
      (edge / math.max((w - 1).toLong * h, 1L) / 255.0).toFloat)
  }

  // ------------------------------------------------------------------
  // Animated GIF (javax.imageio multi-frame sequence) — the video-like
  // container for the frame-sampling path
  // ------------------------------------------------------------------

  /** Constant-gray frame. TYPE_BYTE_GRAY survives the GIF 256-entry
    * palette pixel-exactly (RGB would be quantized/dithered), which is
    * what lets q44 pin decoded frame means analytically.
    */
  def syntheticGrayFrame(width: Int, height: Int, gray: Int): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray & 0xff); x += 1 }
      y += 1
    }
    img
  }

  /** Colormodel-normalizing copy to TYPE_INT_RGB. Needed before PNG
    * re-encoding a decoded GIF frame: the JDK PNG writer routes
    * indexed/gray images through a LINEAR-gray colorspace conversion that
    * shifts pixel values (sRGB 77 comes back as 149); getRGB on the
    * indexed frame returns the palette's exact sRGB values instead.
    */
  def toRgb(img: BufferedImage): BufferedImage =
    if (img.getType == BufferedImage.TYPE_INT_RGB) img
    else {
      val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { out.setRGB(x, y, img.getRGB(x, y)); x += 1 }
        y += 1
      }
      out
    }

  /** Multi-frame GIF via the JDK writer's sequence API. */
  def encodeGifAnimation(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "empty animation")
    val writers = ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF ImageWriter registered in this JVM")
    val writer = writers.next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** All frames of a GIF payload in order; throws on non-GIF bytes (as
    * with [[decodePng]], corrupt media must surface, not score). Each
    * frame is read as stored — callers writing full-size frames (ours)
    * need no disposal-method compositing.
    */
  def decodeGifFrames(payload: Array[Byte]): Seq[BufferedImage] = {
    val readers = ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "no GIF ImageReader registered in this JVM")
    val reader = readers.next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false, true)
      // the JDK reader surfaces junk input as IIOException from
      // getNumImages/read — normalize to the decodePng contract
      val n =
        try reader.getNumImages(true)
        catch { case e: javax.imageio.IIOException =>
          throw new IllegalArgumentException("payload is not a decodable GIF", e)
        }
      require(n > 0, "payload is not a decodable GIF")
      try (0 until n).map(reader.read)
      catch { case e: javax.imageio.IIOException =>
        throw new IllegalArgumentException("payload is not a decodable GIF", e)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  // ------------------------------------------------------------------
  // WAV / PCM16 mono (hand-rolled RIFF, public container layout)
  // ------------------------------------------------------------------

  /** Mono 16-bit PCM sine at `freqHz`, amplitude in [0,1]. */
  def encodeWavSine(sampleRate: Int, nSamples: Int, freqHz: Double, amp: Double): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = math.sin(2.0 * math.Pi * freqHz * i / sampleRate) * amp * Short.MaxValue
      buf.putShort(math.round(v).toShort)
      i += 1
    }
    buf.array()
  }

  /** (sampleRate, samples) from a mono PCM16 WAV; walks RIFF chunks so
    * payloads with extra chunks (LIST/fact) still decode.
    */
  def decodeWavPcm16(payload: Array[Byte]): (Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    require(ascii(4) == "RIFF", "not a RIFF payload")
    buf.getInt // riff size
    require(ascii(4) == "WAVE", "not a WAVE payload")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = ascii(4)
      val len = buf.getInt
      // RIFF pads odd-length chunks with one byte; skipping without the
      // pad would misalign every later chunk id
      val padded = len + (len & 1)
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len bytes)")
          val fmtStart = buf.position()
          val audioFormat = buf.getShort
          val channels = buf.getShort
          require(audioFormat == 1 && channels == 1, "only mono PCM supported")
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          // a non-16-bit PCM payload would silently decode as garbage
          // samples (wrong rms/zcr/peak) — corrupt media must surface
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          buf.position(fmtStart + padded)
        case "data" =>
          require(len >= 0 && len <= buf.remaining(),
            s"data chunk claims $len bytes, ${buf.remaining()} remain")
          val dataStart = buf.position()
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
          // consume the odd trailing byte + RIFF pad like every other
          // branch: a data chunk may legally PRECEDE fmt, and stopping
          // len&~1 bytes in would misalign the rest of the walk
          buf.position(math.min(dataStart + padded, buf.limit()))
        case _ => buf.position(buf.position() + padded)
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  /** [rms, zeroCrossingRate, peak, durationSec] (rms/peak normalized to
    * full scale).
    */
  def audioFeatures(sampleRate: Int, samples: Array[Short]): Array[Float] = {
    var sum2 = 0.0
    var peak = 0.0
    var zc = 0
    var i = 0
    while (i < samples.length) {
      val v = samples(i) / Short.MaxValue.toDouble
      sum2 += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && ((samples(i - 1) >= 0) != (samples(i) >= 0))) zc += 1
      i += 1
    }
    val n = math.max(samples.length, 1)
    Array(
      math.sqrt(sum2 / n).toFloat,
      (zc.toDouble / n).toFloat,
      peak.toFloat,
      (samples.length.toDouble / sampleRate).toFloat)
  }
}
