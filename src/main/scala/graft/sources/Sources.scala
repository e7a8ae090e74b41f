package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable source/sink abstraction (reference S3-S8): the reference
  * reads CSV + MySQL and writes MySQL + BigQuery; in this offline engine
  * the same roles are filled by parquet/CSV/JSON. The JDBC path is the
  * same Spark API the MySQL deployment would use and is exercised
  * end-to-end against embedded Derby (SourcesSpec) — only the URL/driver
  * differ in production.
  */
trait Source { def read(spark: SparkSession): DataFrame }
trait Sink { def write(df: DataFrame): Unit }

final case class ParquetSource(path: String) extends Source {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

final case class CsvSource(path: String, schema: StructType, encoding: String = "UTF-8") extends Source {
  def read(spark: SparkSession): DataFrame =
    graft.ingest.Ingest.readCsv(spark, path, schema, encoding)
}

/** JSON source with explicit schema — covers the reference's declared REST
  * API ingestion (fetch happens driver-side; Spark parses/flattens).
  * Nested structs flatten with `select("rating.*")`-style projections.
  */
final case class JsonSource(path: String, schema: StructType) extends Source {
  def read(spark: SparkSession): DataFrame =
    spark.read.schema(schema).json(path)
}

/** JDBC scan (reference S3), exercised against embedded Derby in
  * SourcesSpec: `partitionColumn/numPartitions` make the read parallel at
  * scale (one connection per partition range) instead of a
  * single-connection pull.
  */
final case class JdbcSource(
    url: String, table: String, user: String, password: String,
    partitionColumn: Option[String] = None,
    lowerBound: Long = 0, upperBound: Long = 1L << 20,
    numPartitions: Int = 32,
    driver: Option[String] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
    val withDriver = driver.fold(base)(base.option("driver", _))
    partitionColumn.fold(withDriver) { pc =>
      withDriver.option("partitionColumn", pc)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }.load()
  }
}

/** Pacing for a polite API client: at most `requestsPerSecond` acquires
  * per second, enforced by spacing consecutive acquires one interval
  * apart. Clock and sleep are injectable so the schedule is unit-tested
  * with a fake clock instead of wall-time sleeps (SourcesSpec).
  */
final class RateLimiter(
    requestsPerSecond: Double,
    clock: () => Long = () => System.nanoTime(),
    sleep: Long => Unit = millis => Thread.sleep(millis)) {
  require(requestsPerSecond > 0, "requestsPerSecond must be positive")
  private val intervalNanos = (1e9 / requestsPerSecond).toLong
  private var nextFree = Long.MinValue
  /** Blocks until a request slot is free; returns the wait in millis. */
  def acquire(): Long = synchronized {
    val now = clock()
    val waitNanos = if (nextFree == Long.MinValue) 0L
      else math.max(0L, nextFree - now)
    if (waitNanos > 0) sleep(waitNanos / 1000000L)
    nextFree = math.max(now, nextFree) + intervalNanos
    waitNanos / 1000000L
  }
}

/** REST/JSON source (reference S7 — `/root/reference/README.md:108-112`:
  * product-catalog API ingestion with rate limiting): each URL is
  * fetched driver-side through the [[RateLimiter]], then the response
  * bodies are parsed against the explicit schema (a top-level JSON array
  * becomes one row per element, Spark's standard json-lines semantics).
  * `file://` URLs make the source fully testable offline (SourcesSpec);
  * in production only the URL scheme changes.
  *
  * Driver-side fetch is deliberate: the reference's API returns a
  * bounded catalog — a DIMENSION, not a fact table. Fetching a large URL
  * corpus belongs in a partitioned `mapPartitions` over a URL table (one
  * limiter per partition), not here.
  */
final case class HttpSource(
    urls: Seq[String],
    schema: StructType,
    requestsPerSecond: Double = 2.0,
    limiter: Option[RateLimiter] = None,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val rl = limiter.getOrElse(new RateLimiter(requestsPerSecond))
    val bodies = urls.map { u =>
      rl.acquire()
      // bounded timeouts: a stalled endpoint must fail the job loudly,
      // not wedge the driver forever on an untimed openStream()
      val conn = new java.net.URI(u).toURL.openConnection()
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      val in = conn.getInputStream
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    import spark.implicits._
    spark.read.schema(schema).json(spark.createDataset(bodies))
  }
}

final case class ParquetSink(path: String, mode: SaveMode = SaveMode.Overwrite,
    partitionBy: Seq[String] = Nil) extends Sink {
  def write(df: DataFrame): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}

/** JDBC append sink (reference S4), exercised against embedded Derby in
  * SourcesSpec — append creates the table on first write, matching the
  * reference's `to_sql(..., if_exists="append")` bootstrap.
  */
final case class JdbcSink(url: String, table: String, user: String, password: String,
    driver: Option[String] = None) extends Sink {
  def write(df: DataFrame): Unit = {
    val base = df.write.mode(SaveMode.Append).format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
    driver.fold(base)(base.option("driver", _)).save()
  }
}
