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
}
