package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream transforms (Structured Streaming surface, SURVEY §2.9).
  *
  * Every transform is written against a plain `DataFrame`, so the SAME
  * function runs in batch (for the DuckDB oracle / `SparkEntry.queries`)
  * and on a `readStream` frame (for production). Watermarks are no-ops in
  * batch mode, which is exactly what makes the batch run the semantic
  * oracle for the streaming run.
  *
  * Scale notes: all aggregations key on (window, event_type) or
  * (user_id, session) — state is bounded by the watermark horizon, and
  * partitioning follows the grouping key. `dropDuplicatesWithinWatermark`
  * keeps the dedup state bounded for unbounded streams.
  */
object EventStreams {

  /** ST1: tumbling 1-hour counts/sums per event_type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** ST2: sliding 1-hour window, 15-minute slide. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** ST3: watermark + late-data drop, expressed batch-side as "events in
    * the final 10-minute horizon before the max timestamp".
    */
  def recentHorizon(events: DataFrame): DataFrame = {
    // Scalar max via broadcast cross-join (NOT an empty-partition window,
    // which would funnel every row through one task at scale).
    val maxTs = events.agg(max(col("ts")).as("_max_ts"))
    events.crossJoin(broadcast(maxTs))
      .filter(col("ts") >= col("_max_ts") - expr("INTERVAL 10 MINUTES"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** ST4: 30-minute-gap sessionization per user. In streaming this is
    * `session_window`; the oracle is gaps-and-islands SQL.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("total_value"))

  /** ST5: stream dedup on event_id. Batch equivalent of
    * `dropDuplicatesWithinWatermark("event_id")` with deterministic
    * first-by-timestamp survivor semantics.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_id"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n_dupes"))

  /** Wire any of the above onto a real stream. Caller owns the query
    * lifecycle; used by StreamingSpec with a memory sink.
    */
  def toMemorySink(df: DataFrame, name: String, outputMode: String = "complete") =
    df.writeStream.outputMode(outputMode).format("memory").queryName(name).start()

  /** File-source stream over a directory of event parquet files (the
    * production ingestion shape: a landing directory new files drop
    * into). File streams cannot infer a schema, so one batch footer read
    * supplies it; `ts` then converts exactly like [[graft.Tables.events]]
    * — raw-ns-long and micros-NTZ generations both land on a session-TZ
    * microsecond timestamp.
    *
    * The ts generation is LOCKED at stream start. On an EMPTY landing
    * directory there is nothing to infer from, so the stream bets on
    * `tsHint` (default: the current generation's micros-NTZ); if the
    * first files to arrive are actually the other generation the stream
    * fails (schema mismatch) rather than misreading — RESTART it then
    * (inference sees the files and picks the right branch), or pass the
    * correct `tsHint` up front when the producer's generation is known.
    *
    * @param tsHint parquet type of `ts` to assume when the directory is
    *               empty: `LongType` (raw-ns) or `TimestampNTZType`
    */
  def fromParquetDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      tsHint: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.TimestampNTZType): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Infer from whatever already landed; an EMPTY (or not-yet-created)
    // landing directory is the normal starting state of an ingest, so
    // inference failure falls back to the declared events schema with
    // the caller's tsHint generation — the stream must be startable
    // before the first file arrives (restart semantics in the scaladoc).
    val schema =
      try spark.read.parquet(dir).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException => StructType(Seq(
          StructField("event_id", LongType), StructField("ts", tsHint),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType)))
      }
    val raw = spark.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
