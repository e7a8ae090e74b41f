package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion surface of the engine: CSV scans with explicit schemas,
  * column-name normalization, multi-format date parsing, null fills and
  * row dedup — the reference's extract/clean stage re-expressed as pure
  * `DataFrame => DataFrame` transforms (see /root/reference/etl/load_sales.py:4-33
  * and /root/reference/etl/load_products.py:4-22 for the behavior being
  * reproduced; no code is shared).
  *
  * Scale notes: every transform here is a narrow projection — no shuffle.
  * CSV reads use explicit `StructType` (never `inferSchema` at scale: that
  * is an extra full pass over the data).
  */
object Ingest {

  /** lowercase, trim, spaces/hyphens → underscore (load_sales.py:13-18). */
  def normalizeName(name: String): String =
    name.trim.toLowerCase.replaceAll("[ \\-]+", "_").replaceAll("[^a-z0-9_]", "")

  /** Rename every column via [[normalizeName]]. Plan-build-time only. */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)

  /** Spark 4 validates charsets strictly — accept the common pandas-style
    * aliases the reference uses and canonicalize them.
    */
  private val charsetAliases = Map(
    "latin1" -> "iso-8859-1", "latin-1" -> "iso-8859-1", "ascii" -> "us-ascii")
  def canonicalCharset(name: String): String =
    charsetAliases.getOrElse(name.toLowerCase, name)

  /** CSV scan with explicit schema + encoding (reference S1/S2).
    * `mode=PERMISSIVE` mirrors pandas' tolerant parse.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      encoding: String = "UTF-8",
      header: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("encoding", canonicalCharset(encoding))
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** CSV scan with schema inference — small files only (option parity with
    * the reference's pandas `read_csv`); prefer [[readCsv]] with a schema.
    */
  def readCsvInferred(spark: SparkSession, path: String, encoding: String = "UTF-8"): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", canonicalCharset(encoding))
      .option("inferSchema", "true")
      .csv(path)

  /** Multi-format tolerant date parse (`pd.to_datetime(errors='coerce')`
    * equivalent): try each format, first non-null wins, else null.
    * Formats cover the reference's sources: `M/d/yyyy` (Superstore) and
    * ISO `yyyy-MM-dd` (dummy retail).
    */
  def parseDateMulti(c: Column, formats: Seq[String] = Seq("M/d/yyyy", "yyyy-MM-dd")): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f)).cast(DateType)): _*)

  /** Cast a set of columns to date with multi-format tolerance. */
  def withParsedDates(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, parseDateMulti(col(c))))

  /** fillna(0) on numeric columns (load_products.py:11). */
  def fillNumeric(df: DataFrame, value: Double = 0.0): DataFrame = df.na.fill(value)

  /** fillna with per-column string defaults (dashboard/app.py:64-65). */
  def fillStrings(df: DataFrame, defaults: Map[String, String]): DataFrame =
    df.na.fill(defaults)

  /** Full-row dedup (load_products.py:10). Shuffles on all columns —
    * at scale prefer [[graft.operators.Dedup.exactByHash]] keyed dedup.
    */
  def dropExactDuplicates(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Explicit schema for the reference's Superstore CSV (FIXTURES.md A1).
    * `postal_code` is a string on purpose: pandas infers int64 and drops
    * leading zeros — a defect we do not replicate.
    */
  val superstoreSchema: StructType = StructType(Seq(
    StructField("Row ID", IntegerType),
    StructField("Order ID", StringType),
    StructField("Order Date", StringType),
    StructField("Ship Date", StringType),
    StructField("Ship Mode", StringType),
    StructField("Customer ID", StringType),
    StructField("Customer Name", StringType),
    StructField("Segment", StringType),
    StructField("Country", StringType),
    StructField("City", StringType),
    StructField("State", StringType),
    StructField("Postal Code", StringType),
    StructField("Region", StringType),
    StructField("Product ID", StringType),
    StructField("Category", StringType),
    StructField("Sub-Category", StringType),
    StructField("Product Name", StringType),
    StructField("Sales", DoubleType),
    StructField("Quantity", IntegerType),
    StructField("Discount", DoubleType),
    StructField("Profit", DoubleType),
  ))

  /** Normalize + parse the Superstore extract end-to-end (ref load_sales.py). */
  def loadSuperstore(spark: SparkSession, path: String): DataFrame = {
    val raw = readCsv(spark, path, superstoreSchema, encoding = "latin1")
    withParsedDates(normalizeColumns(raw), Seq("order_date", "ship_date"))
  }
}
