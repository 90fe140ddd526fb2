package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * The decode step is a STUB (no image/audio libs in this container): a
  * deterministic fake that derives "decoded" properties from the bytes.
  * Everything around it — the asset schema, the per-partition batched
  * execution, the partitioning contract, the output schema — is the real
  * Spark plumbing a production decoder would drop into (swap
  * [[fakeDecode]] for a JNI/FFmpeg/ImageIO call; batch shape unchanged).
  *
  * Scale notes: decode runs as `mapPartitions` so each task amortizes any
  * per-library init cost across its whole partition (the same reason
  * PySpark uses mapInPandas here); payloads never hit the driver; a
  * `repartition` by size-bucket upstream balances skew from mixed asset
  * sizes.
  */
object Multimodal {

  /** Canonical multimodal asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("mime", StringType, nullable = false))), nullable = false)))

  /** Wrap any (id, binary) DataFrame into the asset schema. */
  def toAssets(df: DataFrame, idCol: String, binCol: String,
               modality: String, source: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      col(binCol).cast("binary").as("payload"),
      struct(lit(source).as("source"),
             length(col(binCol).cast("binary")).cast("long").as("n_bytes"),
             lit(s"application/x-$modality").as("mime")).as("meta"))

  /** Decoded-image row produced by the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decoder — deterministic fake. A real implementation replaces the
    * body with e.g. `ImageIO.read(new ByteArrayInputStream(bytes))`; the
    * signature (bytes in, dims + feature vector out) is the production
    * contract. Derivation is pure so the whole pipeline is testable. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = bytes.length
    val width = 64 + (math.abs(n * 31) % 1024)
    val height = 64 + (math.abs(n * 17) % 1024)
    val channels = 3
    // "feature": 8 deterministic byte-statistics — stands in for a CNN embedding
    val feature = new Array[Float](8)
    var i = 0
    while (i < n) { feature(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { feature(j) /= n; j += 1 } }
    (width, height, channels, feature)
  }

  /** Decode stage: per-partition batched map over assets → decoded rows.
    * (Scala analogue of mapInPandas: one iterator per partition, library
    * init once per task, rows streamed not materialized.) */
  def decode(assets: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(decodedSchema))
    assets.select("asset_id", "payload").mapPartitions { it =>
      // real decoder: init native lib HERE, once per task
      it.map { r =>
        val (w, h, c, f) = fakeDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), w, h, c, f.toSeq)
      }
    }(enc)
  }

  /** Resize planning: compute target dims preserving aspect ratio — pure
    * column math over decoded metadata (the byte-level resample would live
    * in the decode task). */
  def resizePlan(decoded: DataFrame, maxSide: Int = 256): DataFrame = {
    val scale = least(lit(maxSide.toDouble) / col("width"),
                      lit(maxSide.toDouble) / col("height"), lit(1.0))
    decoded.withColumn("target_width", ceil(col("width") * scale).cast("int"))
           .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video assets: every `everyN`-th frame index up to
    * `maxFrames` — generates (asset_id, frame_idx) rows to drive a frame
    * decoder, without touching payload bytes. */
  def frameSample(assets: DataFrame, fakeFps: Int = 30, everyN: Int = 30,
                  maxFrames: Int = 16): DataFrame = {
    // stub duration: derived from payload size (1 "second" per 1000 bytes)
    val nFrames = least((col("meta.n_bytes") / 1000 * fakeFps).cast("int"), lit(maxFrames * everyN))
    assets.filter(col("modality") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyN))).as("frame_idx"))
  }
}
