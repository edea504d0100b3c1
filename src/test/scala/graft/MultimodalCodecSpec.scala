package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaCodecs, Multimodal}

/** Real pure-JDK media codecs: PNG encode/decode is lossless (pixel-exact
  * round trip), WAV/PCM16 round-trips samples exactly (incl. foreign RIFF
  * chunks), and the pooled features match analytic expectations.
  */
class MultimodalCodecSpec extends SparkSpec {

  test("PNG encode -> decode is pixel-exact; resize picks source pixels") {
    val img = MediaCodecs.syntheticImage(40, 24, seed = 7L)
    val back = MediaCodecs.decodePng(MediaCodecs.encodePng(img))
    assert(back.getWidth == 40 && back.getHeight == 24)
    for (y <- 0 until 24; x <- 0 until 40)
      assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff), s"px $x,$y")
    val thumb = MediaCodecs.resizeNearest(img, 10, 6)
    assert(thumb.getWidth == 10 && thumb.getHeight == 6)
    // nearest-neighbor: corner pixels map to the source corners
    assert((thumb.getRGB(0, 0) & 0xffffff) == (img.getRGB(0, 0) & 0xffffff))
    val ex = intercept[IllegalArgumentException](MediaCodecs.decodePng("junk".getBytes))
    assert(ex.getMessage.contains("not a decodable image"))
  }

  test("image features: dims exact, gradient means near mid-scale, std sane") {
    val img = MediaCodecs.syntheticImage(64, 48, seed = 42L)
    val f = MediaCodecs.imageFeatures(img)
    assert(f(4) == 64.0f && f(5) == 48.0f)
    assert(math.abs(f(6) - 64.0 / 48.0) < 1e-6) // aspect
    // horizontal R gradient and vertical G gradient both average ~0.5
    assert(f(0) > 0.45f && f(0) < 0.55f, s"meanR=${f(0)}")
    assert(f(1) > 0.45f && f(1) < 0.55f, s"meanG=${f(1)}")
    assert(f(3) > 0.0f && f(3) < 0.5f) // luma std within full scale
    assert(f(7) > 0.0f) // edge energy nonzero for a gradient
  }

  test("WAV PCM16: sample-exact round trip, foreign chunks skipped, analytic rms/zcr") {
    val wav = MediaCodecs.encodeWavSine(8000, 4000, freqHz = 200.0, amp = 0.5)
    val (sr, samples) = MediaCodecs.decodeWavPcm16(wav)
    assert(sr == 8000 && samples.length == 4000)
    val f = MediaCodecs.audioFeatures(sr, samples)
    assert(math.abs(f(0) - 0.5 / math.sqrt(2.0)) < 0.01, s"rms=${f(0)}") // A/sqrt(2)
    assert(math.abs(f(1) - 2.0 * 200.0 / 8000.0) < 0.005, s"zcr=${f(1)}") // 2f/sr
    assert(f(2) > 0.49f && f(2) <= 0.51f, s"peak=${f(2)}")
    assert(f(3) == 0.5f) // 4000 samples at 8 kHz
    // splice a foreign LIST chunk between fmt and data — decode must skip it
    val withList = {
      val head = wav.slice(0, 36) // RIFF..fmt chunk end
      val tail = wav.slice(36, wav.length) // data chunk
      val list = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII")).array()
      head ++ list ++ tail
    }
    val (sr2, samples2) = MediaCodecs.decodeWavPcm16(withList)
    assert(sr2 == 8000 && samples2.sameElements(samples))
    // ODD-length foreign chunk: RIFF pads to even — the walker must skip
    // the pad byte or every later chunk id misaligns
    val withOdd = {
      val head = wav.slice(0, 36)
      val tail = wav.slice(36, wav.length)
      val odd = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("cmnt".getBytes("US-ASCII")).putInt(3)
        .put("abc".getBytes("US-ASCII")).put(0.toByte).array()
      head ++ odd ++ tail
    }
    val (sr3, samples3) = MediaCodecs.decodeWavPcm16(withOdd)
    assert(sr3 == 8000 && samples3.sameElements(samples))
    // data chunk BEFORE fmt, with ODD length: legal RIFF ordering — the
    // data branch must consume its own odd byte + pad like every other
    // branch or the following fmt id misaligns
    val dataFirstOdd = {
      val riffHead = wav.slice(0, 12) // RIFF<size>WAVE
      val fmtChunk = wav.slice(12, 36)
      val oddData = java.nio.ByteBuffer.allocate(8 + 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("data".getBytes("US-ASCII")).putInt(3) // 3 bytes: one sample + odd byte
        .putShort(1234.toShort).put(7.toByte).put(0.toByte).array()
      riffHead ++ oddData ++ fmtChunk
    }
    val (sr4, samples4) = MediaCodecs.decodeWavPcm16(dataFirstOdd)
    assert(sr4 == 8000 && samples4.length == 1 && samples4(0) == 1234.toShort)
  }

  test("GIF animation: multi-frame round trip pixel-exact, sampling keeps every Nth frame") {
    import spark.implicits._
    // codec level: constant-gray frames survive the 256-entry palette exactly
    val frames = (0 until 5).map(k => MediaCodecs.syntheticGrayFrame(24, 16, 40 + k * 37))
    val gif = MediaCodecs.encodeGifAnimation(frames)
    val back = MediaCodecs.decodeGifFrames(gif)
    assert(back.length == 5)
    back.zipWithIndex.foreach { case (f, k) =>
      assert(f.getWidth == 24 && f.getHeight == 16)
      for (y <- 0 until 16; x <- 0 until 24)
        assert(f.getRaster.getSample(x, y, 0) == 40 + k * 37, s"frame $k px $x,$y")
    }
    val ex = intercept[IllegalArgumentException](MediaCodecs.decodeGifFrames("junk".getBytes))
    assert(ex.getMessage.contains("not a decodable GIF"))
    // Spark level: sample every 3rd of 12 frames, per-frame features match
    // the analytic gray (mean = gray/255, std ~ 0)
    val docs = (0L until 25L).toDF("doc_id")
    val media = Multimodal.withGifMedia(docs, nFrames = 12)
    val sampled = Multimodal.sampleFrames(media, everyNth = 3)
    val perDoc = sampled.groupBy("doc_id").agg(
      count(lit(1)).as("n"), max("frame_idx").as("mx"),
      sum(pmod(col("frame_idx"), lit(3))).as("m"))
    assert(perDoc.filter(col("n") =!= 4 || col("mx") =!= 9 || col("m") =!= 0).count() == 0)
    val feats = Multimodal.extractFrameFeatures(sampled)
      .withColumn("exp_gray",
        pmod(col("doc_id") * 31 + col("frame_idx") * 17, lit(256)).cast("double") / 255.0)
    val bad = feats.filter(
      abs(element_at(col("features"), 1) - col("exp_gray")) > 1e-6 ||
      element_at(col("features"), 4) > 1e-3f).count()
    assert(bad == 0, "sampled frame mean/std must match the analytic gray")
  }

  test("Spark plumbing: png/wav media frames decode distributed with exact dims/duration") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val png = Multimodal.withPngMedia(docs)
    val imgFeats = Multimodal.extractImageFeatures(png)
      .join(png.select(col("doc_id"), col("width"), col("height")), "doc_id")
    val badDims = imgFeats.filter(
      element_at(col("features"), 5) =!= col("width").cast("float") ||
      element_at(col("features"), 6) =!= col("height").cast("float")).count()
    assert(badDims == 0, "decoded dims must equal declared dims for every row")
    val wav = Multimodal.withWavMedia(docs)
    val audioFeats = Multimodal.extractAudioFeatures(wav)
    val badDur = audioFeats.filter(element_at(col("features"), 4) =!= 0.5f).count()
    assert(badDur == 0, "duration must be exactly nSamples/sampleRate")
    // rms within 2% of amp/sqrt(2) for every doc (amp derived from id)
    val badRms = audioFeats
      .withColumn("amp", lit(0.25) + pmod(col("doc_id"), lit(4)) * 0.2)
      .filter(abs(element_at(col("features"), 1) - col("amp") / math.sqrt(2.0)) > 0.01)
      .count()
    assert(badRms == 0, "rms must match A/sqrt(2) per doc")
  }
}
