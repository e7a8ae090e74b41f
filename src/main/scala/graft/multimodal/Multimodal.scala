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

  // --- audio ----------------------------------------------------------------

  /** Deterministic 16-bit mono PCM sample `k` of asset `id`: integer
    * formula, so an oracle replays the decoded statistics without parsing
    * bytes — what makes the synth→encode→parse roundtrip hash-checkable.
    */
  private[multimodal] def pcmSample(id: Long, k: Long): Int =
    (((id * 31 + k * 17) % 2003) - 1001).toInt

  private[multimodal] def audioRate(id: Long): Int =
    8000 + 8000 * (id % 2).toInt

  private[multimodal] def audioSamples(id: Long): Int =
    ((id % 50).toInt + 1) * 20

  /** Encode a REAL RIFF/WAVE file: canonical 44-byte header (PCM format
    * chunk, mono, 16-bit) + little-endian samples. The inverse of
    * [[decodeWav]]; both are dependency-free.
    */
  private[multimodal] def encodeWav(rate: Int, samples: Array[Short])
      : Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Audio asset table from the documents table: payload = a REAL WAV
    * file synthesized deterministically per id (rate 8/16 kHz by parity,
    * 20–1000 samples) — opaque bytes downstream, exactly like an ingested
    * recording, but with statistics an oracle can recompute from the
    * generating formula.
    */
  def audioAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true))))
    docs.select(col("doc_id").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val n = audioSamples(id)
          val samples = Array.tabulate(n)(k => pcmSample(id, k.toLong).toShort)
          Row(id, "audio", encodeWav(audioRate(id), samples))
        }
      }(enc)
  }

  /** REAL RIFF/WAVE parser: validates the RIFF/WAVE envelope, walks the
    * chunk list (any order, unknown chunks skipped, word-aligned), and
    * accepts only PCM 16-bit with a data chunk whose length matches the
    * remaining bytes and the block alignment. Returns (sampleRate,
    * channels, nFrames, peak |sample|, Σ|sample|). Truncated or
    * malformed payloads are rejected, never mis-averaged.
    */
  private[multimodal] def decodeWav(p: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] = {
    if (p == null || p.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(p, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    if (b.getInt(4).toLong + 8 != p.length.toLong) return None
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    var i = 12
    while (i + 8 <= p.length) {
      val id = tag(i)
      val len = b.getInt(i + 4)
      // bounds check in LONG: a fabricated len near Int.MaxValue would
      // wrap `i + 8 + len` negative and sneak past an Int comparison
      if (len < 0 || i.toLong + 8L + len > p.length.toLong) return None
      if (id == "fmt " && len >= 16) {
        if (b.getShort(i + 8) != 1) return None // PCM only
        fmt = Some((b.getShort(i + 10).toInt, b.getInt(i + 12),
          b.getShort(i + 22).toInt))
      } else if (id == "data") data = Some((i + 8, len))
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    for {
      (channels, rate, bits) <- fmt
      (off, len) <- data
      if bits == 16 && channels >= 1 && rate > 0
      if len % (2 * channels) == 0
    } yield {
      val nFrames = len.toLong / (2L * channels)
      var peak = 0L
      var sumAbs = 0L
      var j = off
      while (j < off + len) {
        val s = math.abs(b.getShort(j).toLong)
        if (s > peak) peak = s
        sumAbs += s
        j += 2
      }
      (rate, channels, nFrames, peak, sumAbs)
    }
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("peak", LongType, nullable = true),
    StructField("mean_abs_milli", LongType, nullable = true),
    StructField("out_samples_16k", LongType, nullable = true),
  ))

  /** Per-partition batched audio decode ([[decodeWav]] in the
    * mapPartitions slot, like [[extractFeatures]] for images): real RIFF
    * parse → integer-exact loudness stats (peak, mean |sample| in milli
    * units via integer division) + duration and a 16 kHz resample plan
    * (output length under integer rational resampling) — every derived
    * number is integer arithmetic, so the oracle replays the whole
    * decode from the synthesis formula.
    */
  def extractAudioFeatures(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(audioFeatureSchema)
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          decodeWav(r.getAs[Array[Byte]]("payload")) match {
            case Some((rate, ch, n, peak, sumAbs)) =>
              Row(id, true, rate, ch, n,
                n * 1000L / rate,
                peak,
                if (n == 0) 0L else sumAbs * 1000L / n,
                n * 16000L / rate)
            case None =>
              Row(id, false, null, null, null, null, null, null, null)
          }
        }
      }(enc)
  }

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

  // --- image perceptual hash (dHash) near-dup -------------------------------

  /** dHash thumbnail geometry: 9×8 gray pixels → 8 horizontal-gradient
    * comparisons per row × 8 rows = a 64-bit hash. The synth below emits
    * thumbnails at exactly this size; a production pipeline reaches it
    * via the decoder's aspect-ignoring 9×8 downsample ([[resizeDims]] is
    * the aspect-PRESERVING planner for model inputs — dHash wants the
    * fixed grid).
    */
  private[multimodal] val DhashW = 9
  private[multimodal] val DhashH = 8

  /** Deterministic gray value of pixel `idx` (row-major, 0..71) for asset
    * `id`: a group pattern shared by all ids congruent mod 239 (so
    * re-encodes of the same image land in every scale factor), with every
    * 11th id perturbing ONE pixel by +97 — a near-duplicate of its group
    * siblings at dHash hamming distance ≤ 2. Integer formula throughout,
    * so an oracle replays the hash without parsing bytes.
    *
    * The group term MULTIPLIES a quadratic in the pixel index — an
    * affine-in-idx formula (base offset + constant step) makes every
    * group's gradient-sign pattern near-identical (the dHash bit is just
    * "did the constant step wrap"), and the whole corpus collapses into
    * one near-dup cluster; measured over ids 0..999 this form yields
    * exactly the 1 610 same-group pairs and ZERO cross-group pairs at
    * hamming ≤ 3.
    */
  private[multimodal] def grayPixel(id: Long, idx: Int): Int = {
    val base = ((id % 239L + 1L) * (idx + 1L) * (idx + 2L) % 251L).toInt
    if (id % 11L == 0L && idx == (id % 72L).toInt) (base + 97) % 251 else base
  }

  /** Encode a gray raster as a REAL binary PPM (P6): r = g = b = gray. */
  private[multimodal] def encodeP6(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == w * h)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < gray.length) {
      val v = gray(i).toByte
      val o = header.length + i * 3
      out(o) = v; out(o + 1) = v; out(o + 2) = v
      i += 1
    }
    out
  }

  /** Image-thumbnail asset table from the documents table: payload = a
    * REAL 9×8 P6 file per id ([[grayPixel]] raster) — opaque bytes
    * downstream, exactly like a decoded-and-downsampled ingest product.
    */
  def imageAssetsFromDocuments(docs: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true))))
    docs.select(col("doc_id").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val gray = Array.tabulate(DhashW * DhashH)(grayPixel(id, _))
          Row(id, "image", encodeP6(DhashW, DhashH, gray))
        }
      }(enc)
  }

  /** Pixel-level P6 decoder: [[decodePpm]]'s validation (exact raster
    * length, maxval ≤ 255, comment-tolerant header) but returning the
    * gray raster — (r+g+b)/3 integer mean per pixel.
    */
  private[multimodal] def decodeP6Gray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
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
      if dataStart.toLong + w.toLong * h * 3L == p.length.toLong
    } yield {
      val gray = new Array[Int](w * h)
      var j = 0
      while (j < gray.length) {
        val o = dataStart + j * 3
        gray(j) = ((p(o) & 0xff) + (p(o + 1) & 0xff) + (p(o + 2) & 0xff)) / 3
        j += 1
      }
      (w, h, gray)
    }
  }

  /** 64-bit difference hash of a decoded gray raster: bit `r·8+c` set
    * iff pixel (r, c+1) is brighter than (r, c). Defined only for the
    * [[DhashW]]×[[DhashH]] thumbnail grid — anything else is declined
    * (the decline, not a garbage hash, is what downstream sees).
    */
  private[multimodal] def dhash64(w: Int, h: Int, gray: Array[Int]): Option[Long] = {
    if (w != DhashW || h != DhashH) return None
    var hash = 0L
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w - 1) {
        if (gray(r * w + c + 1) > gray(r * w + c)) hash |= 1L << (r * (w - 1) + c)
        c += 1
      }
      r += 1
    }
    Some(hash)
  }

  /** Decode + dHash per asset in the mapPartitions batch slot (the codec
    * boundary). Output: (asset_id, decoded, dhash) — undecodable or
    * non-thumbnail payloads keep `decoded = false` with a null hash.
    */
  def imageHashes(assets: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("dhash", LongType, nullable = true))))
    assets.select(col("asset_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val hash = decodeP6Gray(r.getAs[Array[Byte]]("payload"))
            .flatMap { case (w, h, g) => dhash64(w, h, g) }
          hash match {
            case Some(v) => Row(r.getLong(0), true, v)
            case None => Row(r.getLong(0), false, null)
          }
        }
      }(enc)
  }

  /** Near-duplicate image pairs by dHash hamming distance: band the
    * 64-bit hash into four 16-bit slices, hash-join assets sharing any
    * slice, then confirm with the exact `bit_count(xor)` distance —
    * COMPLETE for `maxHamming ≤ 3` by pigeonhole (3 flipped bits cannot
    * touch all 4 bands), and never all-pairs: the quadratic step is
    * per-band-bucket, exactly the SimHash discipline. Bands stay
    * codegen'd shifts/masks; sign-extension is masked off, so the slice
    * values agree with any two's-complement replayer.
    */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming $maxHamming: pigeonhole completeness over 4 bands needs <= 3")
    val h = hashes.filter(col("decoded")).select(col("asset_id"), col("dhash"))
    val banded = h.select(col("asset_id"), col("dhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("slice", expr("shiftright(dhash, 16 * band) & 65535"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.slice") === col("b.slice") &&
          col("a.asset_id") < col("b.asset_id"))
      .groupBy(col("a.asset_id").as("id_a"), col("b.asset_id").as("id_b"),
        col("a.dhash").as("_ha"), col("b.dhash").as("_hb"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .withColumn("hamming",
        bit_count(col("_ha").bitwiseXOR(col("_hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
