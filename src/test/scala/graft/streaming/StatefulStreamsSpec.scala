package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulStreamsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val batchEvents = Tables.events(spark, sf001)
    .select("event_id", "ts", "user_id", "event_type", "value")

  test("funnel state over a real stream converges to the batch fold") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val rows = batchEvents.as[Ev].collect().sortBy(_.ts.getTime)
    // inactivity horizon longer than the data span: no state times out,
    // so the stream's final state must equal the one-shot batch fold
    // (the timeout path itself is exercised by the default horizon in
    // production; here we pin resume-from-state correctness)
    val funnels = StatefulStreams.trackFunnels(
      StatefulStreams.toUserEvents(stream.toDF()), inactivityTimeoutMin = 60 * 24 * 365)
    val q = funnels.writeStream.outputMode("append")
      .format("memory").queryName("t_funnels").start()
    val (a, b) = rows.splitAt(rows.length / 2)
    stream.addData(a.toIndexedSeq); q.processAllAvailable()
    stream.addData(b.toIndexedSeq); q.processAllAvailable()
    q.stop()
    // last emitted state per user == batch-mode fold over all events
    // round the accumulated double: stream (two folds) and batch (one
    // fold) add purchases in different orders
    val streamed = spark.table("t_funnels")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("reached_purchase"),
        col("purchase_value"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.reached_purchase"),
        round(col("s.purchase_value"), 2).as("purchase_value"))
    val batch = StatefulStreams.trackFunnels(
      StatefulStreams.toUserEvents(batchEvents)).toDF()
      .withColumn("purchase_value", round(col("purchase_value"), 2))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("batch funnel fold matches a direct aggregation") {
    val f = StatefulStreams.trackFunnels(StatefulStreams.toUserEvents(batchEvents))
    val direct = batchEvents.groupBy("user_id").agg(
      count(lit(1)).as("d_n"),
      max((col("event_type") === "purchase").cast("int")).as("d_p"),
      sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)).as("d_v"))
    val joined = f.toDF().join(direct, "user_id")
    assert(joined.filter(col("n_events") =!= col("d_n")).count() === 0)
    assert(joined.filter(col("reached_purchase").cast("int") =!= col("d_p")).count() === 0)
    assert(joined.filter(abs(col("purchase_value") - col("d_v")) > 1e-9).count() === 0)
    assert(f.count() === batchEvents.select("user_id").distinct().count())
  }

  test("stream-stream interval join equals the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val rows = batchEvents.as[Ev].collect()
    val q = StatefulStreams.purchaseAttribution(stream.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_attr").start()
    stream.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_attr")
    val batch = StatefulStreams.purchaseAttribution(batchEvents)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("LEFT OUTER stream-stream join equals the batch left outer join") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val rows = batchEvents.as[Ev].collect()
    val q = StatefulStreams.purchaseAttributionLeftOuter(stream.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("t_attr_lo").start()
    stream.addData(rows.toIndexedSeq)
    q.processAllAvailable()
    // outer (null-signup) results emit only once the watermark proves
    // the join window closed: push it past every real event with
    // far-future sentinels on BOTH watermarked inputs (global watermark
    // = min over inputs). The sentinel purchase itself stays unemitted
    // (nothing ever advances the watermark past IT) and the sentinel
    // signup matches no purchase, so neither pollutes the result.
    val horizon = new java.sql.Timestamp(
      rows.map(_.ts.getTime).max + 24L * 3600 * 1000)
    stream.addData(Ev(-1L, horizon, -1L, "signup", 0.0),
      Ev(-2L, horizon, -2L, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_attr_lo")
    val batch = StatefulStreams.purchaseAttributionLeftOuter(batchEvents)
    // sanity: the outer join is strictly bigger than the inner one and
    // actually contains null-attribution rows
    assert(batch.filter(col("signup_ts").isNull).count() > 0)
    assert(streamed.filter(col("signup_ts").isNull).count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
