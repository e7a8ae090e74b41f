package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, with per-partition batch feature
  * extraction via `mapPartitions` (the JVM analogue of `mapInPandas` —
  * one iterator per partition, so a real decoder could batch to native
  * code). The decode step itself is STUBBED deterministically — the
  * container has no image/audio codecs — but the Spark-side contract
  * (schema, batching, partitioning) is real and tested.
  */
object Multimodal {

  /** Canonical schema of a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
  ))

  /** Build an asset table from the documents table: payload = UTF-8 bytes
    * of the text (a deterministic stand-in for an encoded image).
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(1920)) + 1).cast("int").as("meta_width"),
      (pmod(col("doc_id"), lit(1080)) + 1).cast("int").as("meta_height"))

  /** STUB decoder: a real implementation would hand `payload` to an image
    * library. Deterministic fake: "decode" = byte statistics. Kept out of
    * codegen on purpose to model an opaque native call.
    */
  private def stubDecodeFeatures(payload: Array[Byte]): (Long, Double) = {
    if (payload == null) (0L, 0.0)
    else {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (payload.length.toLong, if (payload.length == 0) 0.0 else sum.toDouble / payload.length)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
  ))

  /** Per-partition batched feature extraction (mapPartitions = the
    * `mapInPandas` shape: one iterator in, one iterator out, so the stub
    * could be replaced by a batched native decoder without plan changes).
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val (len, mean) = stubDecodeFeatures(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), len, mean)
        }
      }(enc)
  }

  /** Codegen-path metadata features (no decode needed): cheap pruning
    * before the expensive decode stage — standard two-phase multimodal
    * pipeline shape (filter on metadata, decode survivors only).
    */
  def metadataFeatures(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("modality"),
      octet_length(col("payload")).cast("bigint").as("payload_bytes"),
      (col("meta_width").cast("long") * col("meta_height")).as("pixels"))

  /** Video-shaped asset table from the documents table: deterministic
    * duration/fps metadata (1-120 s, 24 or 30 fps by id parity) standing
    * in for container-header fields a real demuxer would read.
    */
  def videoAssetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("video").as("modality"),
      ((pmod(col("doc_id"), lit(120)) + 1) * 1000).cast("int").as("duration_ms"),
      when(pmod(col("doc_id"), lit(2)) === 0, 24).otherwise(30).cast("int").as("fps"))

  /** Frame sampling plan: every `everyNth` frame up to `maxFrames` per
    * asset, with integer-exact frame timestamps — one output row per
    * sampled frame. Pure `sequence` + `explode` (codegen'd, no UDF): the
    * row explosion happens executor-side with no shuffle, which is the
    * shape a 100 TB video corpus needs — the decoder then seeks only the
    * sampled offsets instead of decoding whole clips. All arithmetic is
    * integer division so an oracle reproduces it bit-exactly.
    */
  def sampleFrames(videoAssets: DataFrame, everyNth: Int, maxFrames: Int): DataFrame = {
    require(everyNth > 0 && maxFrames > 0)
    videoAssets
      .withColumn("_n_frames", expr("duration_ms * fps div 1000"))
      .withColumn("_n_take",
        least(expr(s"(_n_frames - 1) div $everyNth") + 1, lit(maxFrames.toLong)))
      .filter(col("_n_frames") > 0)
      .select(col("asset_id"), col("fps"),
        explode(sequence(lit(0L), (col("_n_take") - 1) * everyNth,
          lit(everyNth.toLong))).as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        expr("frame_idx * 1000000 div fps").as("ts_us"))
  }

  /** Aspect-fit resize planning: target dimensions fitting a `box`×`box`
    * square, preserving aspect ratio, min 1px — the metadata half of a
    * resize (the pixel work belongs to the stubbed decoder). Integer
    * arithmetic throughout for oracle parity.
    */
  def resizeDims(assets: DataFrame, box: Int): DataFrame =
    assets.select(
      col("asset_id"), col("meta_width"), col("meta_height"),
      greatest(lit(1L),
        expr(s"(meta_width * $box) div greatest(meta_width, meta_height)")).as("out_width"),
      greatest(lit(1L),
        expr(s"(meta_height * $box) div greatest(meta_width, meta_height)")).as("out_height"))
}
