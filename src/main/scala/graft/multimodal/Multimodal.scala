package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, with per-partition batch feature
  * extraction via `mapPartitions` (the JVM analogue of `mapInPandas` —
  * one iterator per partition, so a production decoder batches to native
  * code). The decode slot holds a REAL decoder for binary PPM (P6) — the
  * simplest raster format, parsed dependency-free — with deterministic
  * byte statistics as the fallback for formats the container has no
  * codecs for; the Spark-side contract (schema, batching, partitioning)
  * is identical either way.
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

  /** Fallback "decode": deterministic byte statistics — what every
    * payload gets when no real codec claims it. Kept out of codegen on
    * purpose to model an opaque native call.
    */
  private def byteStats(payload: Array[Byte]): (Long, Double) = {
    if (payload == null) (0L, 0.0)
    else {
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      (payload.length.toLong, if (payload.length == 0) 0.0 else sum.toDouble / payload.length)
    }
  }

  /** REAL decoder for binary PPM (P6): ASCII header `P6 <w> <h> <maxval>`
    * (with `#` comments), exactly one whitespace byte, then w·h·3 raw RGB
    * bytes (maxval ≤ 255, and the payload length must match exactly —
    * truncated or padded rasters are rejected, not mis-averaged). Returns
    * (width, height, mean pixel value). This runs inside the
    * mapPartitions batch exactly where a production codec would; formats
    * without an in-container codec fall back to [[byteStats]].
    */
  private[multimodal] def decodePpm(p: Array[Byte]): Option[(Int, Int, Double)] = {
    if (p == null || p.length < 2 || p(0) != 'P'.toByte || p(1) != '6'.toByte)
      return None
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && i < p.length) {
        if (p(i) == '#'.toByte) { while (i < p.length && p(i) != '\n'.toByte) i += 1 }
        else if (p(i).toChar.isWhitespace) i += 1
        else done = true
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      val start = i
      while (i < p.length && p(i) >= '0'.toByte && p(i) <= '9'.toByte) i += 1
      if (i == start || i - start > 9) None
      else Some(new String(p, start, i - start, "US-ASCII").toInt)
    }
    for {
      w <- readInt(); h <- readInt(); maxv <- readInt()
      if w > 0 && h > 0 && maxv > 0 && maxv < 256
      if i < p.length && p(i).toChar.isWhitespace
      dataStart = i + 1
      n = w.toLong * h * 3L
      if dataStart.toLong + n == p.length.toLong
    } yield {
      var sum = 0L
      var j = dataStart
      while (j < p.length) { sum += p(j) & 0xff; j += 1 }
      (w, h, sum.toDouble / n)
    }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("img_width", IntegerType, nullable = true),
    StructField("img_height", IntegerType, nullable = true),
    StructField("mean_pixel", DoubleType, nullable = true),
  ))

  /** Per-partition batched feature extraction (mapPartitions = the
    * `mapInPandas` shape: one iterator in, one iterator out). Payloads a
    * codec claims ([[decodePpm]]) report real raster dimensions and pixel
    * mean with `decoded = true`; everything else keeps the byte-stat
    * fallback with null raster fields — one schema either way, so the
    * metadata-path oracle stays exact on non-image corpora.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (len, mean) = byteStats(payload)
          decodePpm(payload) match {
            case Some((w, h, mp)) => Row(r.getLong(0), len, mean, true, w, h, mp)
            case None => Row(r.getLong(0), len, mean, false, null, null, null)
          }
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
