package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode/feature-extract over `mapPartitions`.
  *
  * Two codec tiers:
  *  - REAL pure-JDK codecs ([[MediaCodecs]]): PNG decode/resize/pooled
  *    pixel stats via javax.imageio and WAV/PCM16 decode + signal features
  *    via a hand RIFF parse — `withPngMedia`/`extractImageFeatures`,
  *    `withWavMedia`/`extractAudioFeatures`. Gated by analytic invariants
  *    (q44) and MultimodalCodecSpec.
  *  - the byte-histogram STUB path kept for q22: a histogram is the one
  *    feature DuckDB can recompute from the payload bytes, so that path
  *    stays the cross-engine value-exact twin.
  * Everything Spark-side is shared: schema, partition-preserving batch
  * iteration, feature vector shape, metadata struct.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Attach a deterministic fake media payload to each document (bytes of
    * the text stand in for an encoded image).
    */
  def withFakeMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/png").as("media_type"),
      (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: a real implementation decodes the image and pools pixel
    * statistics; the fake derives 8 deterministic floats from byte
    * histogram moments so shape/partitioning/batching are exercised
    * end-to-end.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    // real codecs live in MediaCodecs (extractImageFeatures /
    // extractAudioFeatures); this byte-histogram path is kept because it
    // is the one feature DuckDB can recompute (the q22 cross-engine twin)
    val hist = new Array[Long](8)
    payload.foreach(b => hist((b & 0xff) >> 5) += 1)
    val n = math.max(payload.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Batched feature extraction over partitions — the Scala analogue of a
    * Pandas-UDF `mapInPandas`: one iterator per partition, no per-row
    * driver involvement, output schema declared up front.
    */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
          payload.length, decodeStub(payload).toSeq)
      }
    }(enc)
  }

  /** REAL PNG payloads: a deterministic doc-id-seeded image, encoded with
    * javax.imageio on the executors (mapPartitions — no driver codec work).
    */
  def withPngMedia(docs: DataFrame, maxDim: Int = 96)(
      implicit spark: SparkSession): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // floorMod: Scala % is negative for negative ids, which would both
        // construct an illegal BufferedImage and disagree with the pmod()
        // expectations the q44 analytic gate derives from doc_id
        val w = (Math.floorMod(id, (maxDim - 16).toLong) + 16).toInt
        val h = (Math.floorMod(id * 7, (maxDim - 16).toLong) + 16).toInt
        val png = MediaCodecs.encodePng(MediaCodecs.syntheticImage(w, h, id))
        Row(id, "image/png", w, h, png)
      }
    }(enc)
  }

  /** REAL image features: decode (javax.imageio) + pooled pixel stats of
    * the ORIGINAL raster. Throws on undecodable payloads — corrupt media
    * must surface, not score. (The resize kernel, MediaCodecs
    * .resizeNearest, is NOT on this path — it is exercised and pinned by
    * MultimodalCodecSpec; stats on the full raster are what the q44
    * analytic gates are derived for.)
    */
  def extractImageFeatures(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    // positional access: rows arriving from an upstream mapPartitions
    // carry no schema, so pin the column order with a select first
    media.select("doc_id", "media_type", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](2)
        val img = MediaCodecs.decodePng(payload)
        Row(r.getLong(0), r.getString(1), payload.length,
          MediaCodecs.imageFeatures(img).toSeq)
      }
    }(enc)
  }

  /** REAL WAV payloads: doc-id-seeded mono PCM16 sine (frequency and
    * amplitude derived from the id via floorMod — matching the pmod()
    * expectations of the q44 analytic gate for ANY id sign). NOTE: the
    * shared mediaSchema's `width`/`height` slots carry sampleRate/nSamples
    * for audio rows — a deliberate metadata overload, do not join them
    * against image dims.
    */
  def withWavMedia(docs: DataFrame, sampleRate: Int = 8000, nSamples: Int = 4000)(
      implicit spark: SparkSession): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val freq = 100.0 + Math.floorMod(id, 40L) * 10.0
        val amp = 0.25 + Math.floorMod(id, 4L) * 0.2
        val wav = MediaCodecs.encodeWavSine(sampleRate, nSamples, freq, amp)
        Row(id, "audio/wav", sampleRate, nSamples, wav)
      }
    }(enc)
  }

  /** REAL audio features: RIFF/PCM16 decode + [rms, zcr, peak, duration]. */
  def extractAudioFeatures(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("doc_id", "media_type", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](2)
        val (sr, samples) = MediaCodecs.decodeWavPcm16(payload)
        Row(r.getLong(0), r.getString(1), payload.length,
          MediaCodecs.audioFeatures(sr, samples).toSeq)
      }
    }(enc)
  }

  /** Deterministic per-frame gray level — the analytic twin the q44 gate
    * recomputes from (doc_id, frame_idx) alone.
    */
  def frameGray(id: Long, frameIdx: Int): Int =
    Math.floorMod(id * 31L + frameIdx * 17L, 256L).toInt

  /** REAL video-like payloads: a deterministic animated GIF per doc (JDK
    * multi-frame sequence writer; constant-gray frames round-trip the
    * 256-entry gray palette pixel-exactly). width/height carry the frame
    * dims; the frame count is a pipeline parameter, not metadata.
    */
  def withGifMedia(docs: DataFrame, nFrames: Int = 12, maxDim: Int = 64)(
      implicit spark: SparkSession): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (Math.floorMod(id, (maxDim - 16).toLong) + 16).toInt
        val h = (Math.floorMod(id * 7, (maxDim - 16).toLong) + 16).toInt
        val frames = (0 until nFrames).map(k =>
          MediaCodecs.syntheticGrayFrame(w, h, frameGray(id, k)))
        Row(id, "image/gif", w, h, MediaCodecs.encodeGifAnimation(frames))
      }
    }(enc)
  }

  /** REAL frame sampling (replaces the round-2 byte-window stub): decode
    * the GIF container on the executors, keep every `everyNth` frame
    * (frame 0 always kept), re-encode each kept frame as PNG — the
    * keyframe-extract step of a video ingest pipeline; feed the result to
    * [[extractFrameFeatures]]. Partition-preserving, no driver codec work.
    */
  def sampleFrames(media: DataFrame, everyNth: Int)(implicit spark: SparkSession): DataFrame = {
    require(everyNth >= 1, "everyNth must be >= 1")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("doc_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = MediaCodecs.decodeGifFrames(r.getAs[Array[Byte]](1))
        frames.iterator.zipWithIndex.collect {
          case (f, k) if k % everyNth == 0 =>
            // toRgb: PNG-encoding the indexed GIF raster directly would
            // shift pixel values through the JDK's linear-gray path
            Row(r.getLong(0), k, MediaCodecs.encodePng(MediaCodecs.toRgb(f)))
        }
      }
    }(enc)
  }

  /** Per-sampled-frame pooled pixel features (same 8-float vector as
    * [[extractImageFeatures]], keyed by (doc_id, frame_idx)).
    */
  def extractFrameFeatures(frames: DataFrame)(implicit spark: SparkSession): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    frames.select("doc_id", "frame_idx", "frame").mapPartitions { rows =>
      rows.map { r =>
        val img = MediaCodecs.decodePng(r.getAs[Array[Byte]](2))
        Row(r.getLong(0), r.getInt(1), MediaCodecs.imageFeatures(img).toSeq)
      }
    }(enc)
  }
}
