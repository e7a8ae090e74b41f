package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("estimates never undercount: est >= exact for every token (real corpus)") {
    val toks = CountMin.tokens(graft.Tables.documents(spark, sf001), "text")
      .persist()
    val sk = CountMin.sketch(toks, depth = 4, width = 256)
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val joined = CountMin.estimates(sk, exact.select(col("tok")), 4, 256)
      .join(exact, Seq("tok"))
    assert(joined.filter(col("est") < col("n_exact")).isEmpty,
      "count-min must only ever overestimate")
    // every distinct token gets an estimate (no token falls out of the join)
    assert(joined.count() === exact.count())
    toks.unpersist()
  }

  test("a degenerate 1x1 sketch estimates every token at the stream total") {
    val docs = Seq((1L, "a b c a"), (2L, "b d")).toDF("doc_id", "text")
    val toks = CountMin.tokens(docs, "text")
    val sk = CountMin.sketch(toks, depth = 1, width = 1)
    val est = CountMin.estimates(sk, toks.distinct(), 1, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.values.toSet === Set(6L), "one cell absorbs the whole stream")
  }

  test("heavyHitters surfaces the dominant token with exact count attached") {
    val text = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"rare$i")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    // threshold = 100 tokens / 50 = 2: only "hot" (60) can reach it via
    // min-of-4 cells unless two rare tokens collide in ALL four rows
    val hh = CountMin.heavyHitters(docs, fractionDenom = 50L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.exists { case (t, _, n) => t == "hot" && n == 60L })
    assert(hh.forall { case (_, est, n) => est >= n })
  }

  test("sketch builds incrementally on a real stream and equals the batch sketch") {
    // the sketch is a plain (h, bucket) groupBy-count — the shape that
    // runs unchanged as a streaming aggregation: cells accumulate across
    // micro-batches and the final state equals the one-shot batch build
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val sk = CountMin.sketch(stream.toDF().select(col("value").as("tok")),
      depth = 4, width = 64)
    val q = sk.writeStream.outputMode("complete")
      .format("memory").queryName("t_cms").start()
    val toks = CountMin.tokens(graft.Tables.documents(spark, sf001), "text")
      .as[String].collect()
    val (a, b) = toks.splitAt(toks.length / 2)
    stream.addData(a.toIndexedSeq); q.processAllAvailable()
    stream.addData(b.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_cms")
    val batch = CountMin.sketch(toks.toSeq.toDF("tok"), depth = 4, width = 64)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("sketch size is bounded by depth*width regardless of input") {
    val toks = CountMin.tokens(graft.Tables.documents(spark, sf001), "text")
    assert(CountMin.sketch(toks, depth = 4, width = 16).count() <= 64L)
  }
}
