package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode/feature-extract over `mapPartitions`.
  *
  * The actual codecs are STUBBED (this container ships no image/audio
  * libraries — the decode body is a clearly-marked deterministic fake);
  * everything Spark-side is real and tested: schema, partition-preserving
  * batch iteration, feature vector shape, and the metadata struct. On a
  * real cluster the stub body is replaced by the codec call (or an Arrow
  * `mapInPandas` on the Python side); nothing else changes.
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
    // ??? <- real codec call goes here (e.g. ImageIO / ffmpeg / JNI)
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

  /** STUB frame sampling for video-like payloads: slices the payload into
    * `frames` equal windows (a real implementation seeks keyframes).
    */
  def sampleFrames(media: DataFrame, frames: Int)(implicit spark: SparkSession): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val step = math.max(payload.length / frames, 1)
        (0 until frames).iterator.map { i =>
          val from = math.min(i * step, payload.length)
          val until = math.min(from + step, payload.length)
          Row(r.getAs[Long]("doc_id"), i, payload.slice(from, until))
        }
      }
    }(enc)
  }
}
