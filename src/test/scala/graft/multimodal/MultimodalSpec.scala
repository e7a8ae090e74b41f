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
}
