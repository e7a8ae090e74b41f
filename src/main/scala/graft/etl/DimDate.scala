package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-dimension derivation (reference `etl/load_to_query.py:152-160`):
  * `date_key = yyyymmdd int`, calendar parts, pandas-semantics weekday
  * (Mon=0 — Spark's `weekday()`, NOT `dayofweek()` which is Sun=1), plus
  * the README-declared `is_weekend` / `fiscal_year` buckets
  * (/root/reference/README.md:124-127).
  *
  * Pure projection — no shuffle except the final `distinct` on the date
  * column, which is tiny (one row per calendar day) at any scale.
  */
object DimDate {

  def dateKey(c: Column): Column =
    (year(c) * 10000 + month(c) * 100 + dayofmonth(c)).cast("int")

  /** Build the date dimension from a date/timestamp column of `df`. */
  def fromColumn(df: DataFrame, dateCol: String): DataFrame = {
    val d = col(dateCol).cast("date")
    df.select(d.as("order_date")).distinct()
      .select(
        col("order_date"),
        dateKey(col("order_date")).as("date_key"),
        year(col("order_date")).as("year"),
        quarter(col("order_date")).as("quarter"),
        month(col("order_date")).as("month"),
        weekday(col("order_date")).as("weekday"),
        weekday(col("order_date")).geq(5).cast("int").as("is_weekend"),
        when(month(col("order_date")) >= 7, year(col("order_date")) + 1)
          .otherwise(year(col("order_date"))).cast("int").as("fiscal_year"))
  }
}
