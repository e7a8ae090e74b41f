package graft.functions

import graft.SparkSpec
import graft.functions.TopKByCountAggregator.topKByCount
import org.apache.spark.sql.functions._

class TopKByCountAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("g1", "a"), ("g1", "a"), ("g1", "a"),
    ("g1", "b"), ("g1", "b"),
    ("g1", "c"), ("g1", "d"),
    ("g2", "x"),
  ).toDF("g", "v")

  test("returns exact top-k by count with value tiebreak") {
    val got = rows.groupBy($"g").agg(topKByCount(2)($"v").as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", $"pos", $"col.value", $"col.n")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.toSet === Set(
      ("g1", 0, "a", 3L), ("g1", 1, "b", 2L), ("g2", 0, "x", 1L)))
  }

  test("tie at equal counts breaks by value order") {
    val tied = Seq(("g", "z"), ("g", "y"), ("g", "z"), ("g", "y"), ("g", "w"))
      .toDF("g", "v")
    val got = tied.groupBy($"g").agg(topKByCount(2)($"v").as("top"))
      .select(posexplode($"top")).select($"col.value").as[String].collect()
    assert(got.toSeq === Seq("y", "z")) // both count 2; y < z
  }

  test("result is partition-independent (merge path exercised)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"g").agg(topKByCount(3)($"v").as("top")).collect()
        .map(r => r.getString(0) -> r.getSeq[Any](1).toSeq).toMap
    assert(run(rows) === run(rows.repartition(7)))
  }

  test("works as a streaming aggregate: incremental batches equal the batch run") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(String, String)]
    val agg = stream.toDF().toDF("g", "v")
      .groupBy($"g").agg(topKByCount(2)($"v").as("top"))
    val q = agg.writeStream.format("memory").queryName("t_udaf_topk")
      .outputMode("complete").start()
    val data = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"))
    val late = Seq(("g1", "b"), ("g1", "b"), ("g2", "x"))
    stream.addData(data)
    q.processAllAvailable()
    stream.addData(late) // b overtakes a only after the second batch
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_udaf_topk")
    val batch = (data ++ late).toDF("g", "v")
      .groupBy($"g").agg(topKByCount(2)($"v").as("top"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("null inputs are ignored, not counted") {
    val withNulls = Seq(("g", Some("a")), ("g", None), ("g", Some("a")))
      .toDF("g", "v")
    val got = withNulls.groupBy($"g").agg(topKByCount(1)($"v").as("top"))
      .select(posexplode($"top")).select($"col.value", $"col.n")
      .collect()
    assert(got.length === 1)
    assert((got(0).getString(0), got(0).getLong(1)) === ("a", 2L))
  }
}
