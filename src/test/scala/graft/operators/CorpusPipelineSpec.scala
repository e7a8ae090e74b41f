package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"

  private val docs = Seq(
    (1L, base * 4),                          // good doc
    (2L, base * 4),                          // exact dup of 1
    (3L, (base + " extra") * 4),             // near-dup of 1
    (4L, "tiny"),                            // fails length gate
    (5L, "!!! ??? ... ;;; ::: !!! ??? ... " * 10), // fails quality gate
    (6L, ("der hund und die katze ist das haus und der baum ist " * 6)), // german
  ).toDF("doc_id", "text")

  test("gate drops short and low-quality docs") {
    // punct-only docs score ~0.32 (length alone contributes 0.5 weight);
    // 0.4 separates them from real prose (~0.6-0.7)
    val g = CorpusPipeline.gate(docs, CorpusPipeline.Config(minQuality = 0.4))
    val ids = g.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(4L) && !ids.contains(5L))
    assert(ids.contains(1L) && ids.contains(6L))
  }

  test("language filter keeps only requested languages") {
    val g = CorpusPipeline.gate(docs, CorpusPipeline.Config(langs = Seq("en")))
    val ids = g.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L))
  }

  test("full pipeline: exact dup and near-dup both removed, smallest id survives") {
    val out = CorpusPipeline.prepare(docs,
      CorpusPipeline.Config(minQuality = 0.4, nearDupThreshold = 0.5))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L))
    assert(!ids.contains(2L)) // exact dup
    assert(!ids.contains(3L)) // near dup
    assert(ids.contains(6L))
  }

  test("token report aggregates by predicted language") {
    val rep = CorpusPipeline.tokenReport(
      CorpusPipeline.gate(docs, CorpusPipeline.Config()))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("en") === 3)
    assert(rep("de") === 1)
  }

  test("pairwise jaccard expression matches the set definition") {
    val j = Seq(("a b c d e", "a b c d x"))
      .toDF("x", "y")
      .select(Dedup.jaccardColumns(col("x"), col("y"), 3).as("j"))
      .collect()(0).getDouble(0)
    // shingles: {abc,bcd,cde} vs {abc,bcd,cdx}: inter 2, union 4
    assert(j === 0.5)
  }

  test("jaccardOnCandidates keeps short-doc pairs at 0 and tolerates duplicate pairs") {
    val d = Seq((1L, "a b c d e"), (2L, "a b c d x"), (3L, "xy")).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.jaccardOnCandidates(cands, d, "text", "doc_id", 3)
      .orderBy("id_a", "id_b").collect()
    assert(got.length === 2) // duplicates collapsed, short-doc pair kept
    assert(got(0).getAs[Double]("jaccard") === 0.5)
    assert(got(1).getAs[Double]("jaccard") === 0.0) // doc 3 has < 3 tokens
  }

  test("the gate is streamable: MemoryStream run equals the batch run") {
    // gate is a stateless narrow transform, so it runs unchanged over a
    // stream in append mode — the property that lets a pipeline annotate
    // and filter documents AS THEY ARRIVE, before any stateful dedup.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = graft.Tables.documents(spark, sf001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val stream = MemoryStream[(Long, String)]
    val cfg = CorpusPipeline.Config()
    val q = CorpusPipeline.gate(stream.toDF().toDF("doc_id", "text"), cfg)
      .writeStream.format("memory").queryName("t_gate").outputMode("append")
      .start()
    val (first, rest) = rows.splitAt(rows.length / 2)
    stream.addData(first.toIndexedSeq)
    q.processAllAvailable()
    stream.addData(rest.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_gate")
    val batch = CorpusPipeline.gate(
      graft.Tables.documents(spark, sf001).select($"doc_id", $"text"), cfg)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
