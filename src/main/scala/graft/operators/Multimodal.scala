package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / frame-sample stages.
 *
 * The Spark-side plumbing (schema, partitioning, batch iteration) is real and
 * tested; the actual media decode is STUBBED (no image/audio libs in this
 * container) behind `decodeStub`, a deterministic fake that derives
 * "features" from the bytes — swap it for a real codec at deployment.
 *
 * Scale design: binary payloads stay opaque until the per-partition decode
 * stage (`mapPartitions`, the Scala analog of `mapInPandas` batch UDFs);
 * metadata extraction is pure expression level so pruning/pushdown still
 * work; `spark.sql.files.maxPartitionBytes` bounds decode batch memory.
 */
object Multimodal {

  /** Media asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = true),
      StructField("content_md5", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Expression-level metadata over a binary column — no decode needed, fully
    * codegen'd: byte length + content hash. */
  def withByteMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast(LongType))
      .withColumn("content_md5", md5(col(payloadCol)))

  /** STUB decode: deterministic fake "decoded frame" — real deployments
    * replace this with an image/audio codec. Keeps the exact batch shape a
    * real decoder would use. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    // deterministic fake features: 8 bytes → 8 floats in [0,1)
    val n = 8
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (if (payload.length > i) (payload(i) & 0xff) else 0) / 256.0f
      i += 1
    }
    out
  }

  /** Feature extraction over binary payloads: per-partition batch decode
    * (the mapInPandas analog — one decoder instance per partition, rows
    * streamed through it). Output: (id, features array<float>). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // per-partition "decoder" setup happens here (stubbed) — one decoder
        // instance per partition, rows streamed through it in batches.
        iter.map { case (id, payload) =>
          (id, decodeStub(if (payload == null) Array.empty[Byte] else payload))
        }
      }
      .toDF("id", "features")
  }

  /** Frame sampling stub for video payloads: take every `stride`-th chunk of
    * `frameBytes` bytes as a "frame" (expression-level — real decoders swap in
    * at the mapPartitions stage). */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int = 16,
                   stride: Int = 4, result: String = "frames"): DataFrame =
    df.withColumn(result,
      transform(
        sequence(lit(0), greatest(
          floor(length(col(payloadCol)) / (frameBytes * stride)).cast(IntegerType) - 1, lit(0))),
        i => col(payloadCol).substr(lit(1) + i * (frameBytes * stride), lit(frameBytes))))
}
