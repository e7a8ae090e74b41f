package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "abc"), (1L, ""), (2L, "zz")).toDF("doc_id", "text")

  test("assetsFromDocuments produces the canonical asset schema") {
    val a = Multimodal.assetsFromDocuments(docs)
    assert(a.schema.fieldNames.toSeq ===
      Multimodal.assetSchema.fieldNames.toSeq)
    val r = a.filter(col("asset_id") === 0).collect()(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "abc")
  }

  test("extractFeatures: byte stats match a manual computation") {
    val f = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(docs))
      .orderBy("asset_id").collect()
    assert(f(0).getLong(1) === 3L)
    assert(f(0).getDouble(2) === ('a'.toInt + 'b'.toInt + 'c'.toInt) / 3.0)
    assert(f(1).getLong(1) === 0L)
    assert(f(1).getDouble(2) === 0.0)
  }

  private def ppm(w: Int, h: Int, header: String = "")(pixels: Int*): Array[Byte] = {
    val head = s"P6$header\n$w $h\n255\n".getBytes("US-ASCII")
    head ++ pixels.map(_.toByte).toArray
  }

  test("extractFeatures REALLY decodes P6 PPM payloads in the batch slot") {
    // 2x1 image: pixels (10,20,30) and (40,50,60) -> mean 35.0; header
    // carries a comment line, which the parser must skip
    val img = ppm(2, 1, "\n# a comment")(10, 20, 30, 40, 50, 60)
    val rows = Seq(
      (0L, img),
      (1L, "not an image".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "payload")
    val f = Multimodal.extractFeatures(rows).orderBy("asset_id").collect()
    assert(f(0).getBoolean(3), "PPM payload must take the decode path")
    assert((f(0).getInt(4), f(0).getInt(5)) === ((2, 1)))
    assert(f(0).getDouble(6) === 35.0)
    assert(f(0).getLong(1) === img.length.toLong) // byte stats still present
    assert(!f(1).getBoolean(3) && f(1).isNullAt(4) && f(1).isNullAt(6))
    assert(!f(2).getBoolean(3) && f(2).getLong(1) === 0L)
  }

  test("decodePpm rejects malformed rasters instead of mis-averaging") {
    val good = ppm(2, 2)(Seq.fill(12)(100): _*)
    assert(Multimodal.decodePpm(good) === Some((2, 2, 100.0)))
    // truncated raster (one byte short) and padded raster (one extra)
    assert(Multimodal.decodePpm(good.dropRight(1)) === None)
    assert(Multimodal.decodePpm(good :+ 0.toByte) === None)
    // 16-bit maxval (65535) is a different wire format — decline it
    val deep = "P6\n1 1\n65535\n".getBytes("US-ASCII") ++ Array.fill(6)(1.toByte)
    assert(Multimodal.decodePpm(deep) === None)
    // P5 (grayscale) magic is not P6
    assert(Multimodal.decodePpm("P5\n1 1\n255\n abc".getBytes) === None)
    assert(Multimodal.decodePpm(null) === None)
  }

  test("metadataFeatures stays codegen-side and reports sizes") {
    val m = Multimodal.metadataFeatures(Multimodal.assetsFromDocuments(docs))
      .orderBy("asset_id").collect()
    assert(m(0).getLong(2) === 3L)
    assert(m(0).getLong(3) === 1L * 1L)
  }

  test("sampleFrames: every-Nth frames, maxFrames cap, exact timestamps") {
    import spark.implicits._
    val v = Seq(
      (1L, 1000, 24),    // 24 frames -> idx 0,3,...,21 (8 rows)
      (2L, 120000, 30),  // 3600 frames -> capped at 16 rows
      (3L, 0, 24))       // zero frames -> no rows
      .toDF("asset_id", "duration_ms", "fps")
    val got = Multimodal.sampleFrames(v, everyNth = 3, maxFrames = 16)
      .orderBy("asset_id", "frame_idx").collect()
    val byAsset = got.groupBy(_.getLong(0))
    assert(byAsset(1L).map(_.getLong(1)).toSeq === (0L to 21L by 3))
    assert(byAsset(2L).length === 16)
    assert(!byAsset.contains(3L))
    // frame 3 at 24 fps = 125000 µs exactly (integer division both ways)
    assert(byAsset(1L).find(_.getLong(1) == 3L).get.getLong(2) === 125000L)
  }

  test("resizeDims aspect-fits into the box and floors at 1px") {
    import spark.implicits._
    val a = Seq(
      (1L, 1920, 1080),  // landscape -> (224, 126)
      (2L, 10, 2000),    // extreme portrait -> floor to (1, 224)
      (3L, 50, 50))      // square upscales -> (224, 224)
      .toDF("asset_id", "meta_width", "meta_height")
    val got = Multimodal.resizeDims(a, box = 224).orderBy("asset_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((1L, 224L, 126L), (2L, 1L, 224L), (3L, 224L, 224L)))
  }

  test("WAV roundtrip: encode → chunk-walking parse reproduces the samples") {
    val samples = Array[Short](0, 100, -200, 32767, -32768, 5)
    val wav = Multimodal.encodeWav(16000, samples)
    val Some((rate, ch, n, peak, sumAbs)) = Multimodal.decodeWav(wav)
    assert(rate === 16000 && ch === 1 && n === 6L)
    assert(peak === 32768L)
    assert(sumAbs === samples.map(s => math.abs(s.toLong)).sum)
    // an unknown chunk BEFORE fmt/data must be skipped, not fatal
    val extra = java.nio.ByteBuffer
      .allocate(wav.length + 12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(wav, 0, 12) // RIFF header
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
    extra.put(wav, 12, wav.length - 12)
    val withChunk = extra.array()
    // patch the RIFF size for the inserted 12 bytes
    java.nio.ByteBuffer.wrap(withChunk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, withChunk.length - 8)
    assert(Multimodal.decodeWav(withChunk).exists(_._3 === 6L))
  }

  test("decodeWav rejects truncated or malformed payloads") {
    val wav = Multimodal.encodeWav(8000, Array[Short](1, 2, 3, 4))
    assert(Multimodal.decodeWav(wav.dropRight(1)).isEmpty) // truncated data
    assert(Multimodal.decodeWav(wav.take(30)).isEmpty) // truncated header
    val notRiff = wav.clone(); notRiff(0) = 'X'.toByte
    assert(Multimodal.decodeWav(notRiff).isEmpty)
    val float = wav.clone(); float(20) = 3 // format code != PCM
    assert(Multimodal.decodeWav(float).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
  }

  test("audio pipeline: synthesized assets decode to the formula's stats") {
    val a = Multimodal.audioAssetsFromDocuments(
      Seq((3L, "x"), (10L, "y")).toDF("doc_id", "text"))
    val f = Multimodal.extractAudioFeatures(a).orderBy("asset_id").collect()
    assert(f.forall(_.getBoolean(1)), "all synthesized payloads must decode")
    val r3 = f(0)
    val n3 = Multimodal.audioSamples(3L)
    val abs3 = (0 until n3).map(k => math.abs(Multimodal.pcmSample(3L, k.toLong).toLong))
    assert(r3.getAs[Int]("sample_rate") === 16000) // odd id → 16 kHz
    assert(r3.getAs[Long]("n_samples") === n3.toLong)
    assert(r3.getAs[Long]("peak") === abs3.max)
    assert(r3.getAs[Long]("mean_abs_milli") === abs3.sum * 1000L / n3)
    assert(r3.getAs[Long]("out_samples_16k") === n3.toLong)
    val r10 = f(1)
    assert(r10.getAs[Int]("sample_rate") === 8000)
    assert(r10.getAs[Long]("out_samples_16k") ===
      r10.getAs[Long]("n_samples") * 2)
  }

  test("P6 gray roundtrip: encode → pixel decode reproduces the raster") {
    val gray = Array.tabulate(72)(i => (i * 37) % 251)
    val p = Multimodal.encodeP6(9, 8, gray)
    val Some((w, h, got)) = Multimodal.decodeP6Gray(p)
    assert((w, h) === (9, 8))
    assert(got.toSeq === gray.toSeq)
    // truncated raster declined, not mis-read
    assert(Multimodal.decodeP6Gray(p.dropRight(1)).isEmpty)
    assert(Multimodal.decodeP6Gray("P5\n9 8\n255\n".getBytes).isEmpty)
  }

  test("dhash64: gradient rows set bits exactly where brightness rises") {
    // row-major 9x8: even rows strictly increasing (8 bits set), odd rows
    // strictly decreasing (0 bits)
    val gray = Array.tabulate(72) { i =>
      val r = i / 9; val c = i % 9
      if (r % 2 == 0) c * 10 else 100 - c * 10
    }
    val Some(hash) = Multimodal.dhash64(9, 8, gray)
    val expected = (0 until 8).filter(_ % 2 == 0)
      .foldLeft(0L)((acc, r) => acc | (0xffL << (r * 8)))
    assert(hash === expected)
    assert(Multimodal.dhash64(3, 3, Array.fill(9)(0)).isEmpty) // wrong grid
  }

  test("image near-dup: perturbed group sibling found, foreign image not") {
    // ids 239 apart share a group raster; 66 = 11k perturbs one pixel
    val docs = Seq(66L, 66L + 239L, 5L).map((_, "x")).toDF("doc_id", "text")
    val hashes = Multimodal.imageHashes(Multimodal.imageAssetsFromDocuments(docs))
    assert(hashes.filter(col("decoded")).count() === 3)
    val pairs = Multimodal.imageNearDupPairs(hashes).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((66L, 66L + 239L)))
    val ham = pairs.head._3
    assert(ham >= 1 && ham <= 2, s"one perturbed pixel flips 1-2 dHash bits, got $ham")
  }

  test("image near-dup confirm is exact: identical rasters at hamming 0") {
    val docs = Seq(7L, 7L + 239L, 7L + 478L).map((_, "x")).toDF("doc_id", "text")
    val pairs = Multimodal.imageNearDupPairs(
        Multimodal.imageHashes(Multimodal.imageAssetsFromDocuments(docs)))
      .collect()
    assert(pairs.length === 3) // all three pairs of the triple
    assert(pairs.forall(_.getAs[Int]("hamming") === 0))
  }
}
