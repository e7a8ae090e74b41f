package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dashboard's analytics surface
  * (/root/reference/dashboard/app.py:49-154) over the star schema
  * produced by [[graft.etl.RetailWarehouse]] — everything the Streamlit
  * app computes client-side in pandas, expressed as Spark plans over the
  * warehouse so it runs where the data lives and only chart-sized
  * results cross the collect boundary (S9).
  *
  * `starJoin` mirrors the app's cached BigQuery query (app.py:51-58):
  * fact ⋈ current dim rows, dims broadcast. Every downstream aggregate
  * reuses the one joined frame — callers should `persist()` it when
  * serving several charts, as the app's `@st.cache_data` does.
  */
object Dashboard {

  /** fact ⋈ dim_customer ⋈ dim_product (current versions only). */
  def starJoin(fact: DataFrame, dimCustomer: DataFrame, dimProduct: DataFrame): DataFrame = {
    val cust = dimCustomer.filter(col("is_current") === 1)
      .select(col("customer_key"), col("customer_name"), col("segment"))
    val prod = dimProduct.filter(col("is_current") === 1)
      .select(col("product_key"), col("product_name"), col("category"))
    fact
      .join(broadcast(cust), Seq("customer_key"), "left")
      .join(broadcast(prod), Seq("product_key"), "left")
  }

  /** Dashboard fillna defaults (app.py:64-65). */
  def withDefaults(star: DataFrame): DataFrame =
    star.na.fill(Map("category" -> "Jewellery", "segment" -> "Consumer"))

  /** Slicer filter (app.py:84-87): equality on any dimension column. */
  def slice(star: DataFrame, filters: Map[String, String]): DataFrame =
    filters.foldLeft(star) { case (df, (c, v)) => df.filter(col(c) === v) }

  /** KPI row (app.py:96-99): total sales, total profit, transaction
    * count, average order value — one aggregate job.
    */
  def kpis(star: DataFrame): DataFrame =
    star.agg(
      sum(col("sales").cast("decimal(27,4)")).cast("double").as("total_sales"),
      sum(col("profit").cast("decimal(27,4)")).cast("double").as("total_profit"),
      count(lit(1)).as("n_transactions"),
      (sum(col("sales").cast("decimal(27,4)")).cast("double") / count(lit(1)))
        .as("avg_order_value"))

  /** Sales trend by order date (app.py:107). */
  def salesByDate(star: DataFrame): DataFrame =
    star.groupBy(col("order_date"))
      .agg(sum(col("sales").cast("decimal(27,4)")).cast("double").as("sales"))
      .orderBy(col("order_date"))

  /** Profit by category (app.py:136). */
  def profitByCategory(star: DataFrame): DataFrame =
    star.groupBy(col("category"))
      .agg(sum(col("profit").cast("decimal(27,4)")).cast("double").as("profit"))
      .orderBy(col("category"))

  /** Sales by segment (app.py:150). */
  def salesBySegment(star: DataFrame): DataFrame =
    star.groupBy(col("segment"))
      .agg(sum(col("sales").cast("decimal(27,4)")).cast("double").as("sales"))
      .orderBy(col("segment"))

  /** Selected-vs-rest-of-market comparison (app.py:114-132): the chosen
    * category's sales/profit next to everything else's (P8 + F10).
    */
  def categoryVsRest(star: DataFrame, category: String): DataFrame =
    star.withColumn("side",
        when(col("category") === category, lit("selected")).otherwise(lit("rest")))
      .groupBy(col("side"))
      .agg(sum(col("sales").cast("decimal(27,4)")).cast("double").as("sales"),
        sum(col("profit").cast("decimal(27,4)")).cast("double").as("profit"))
      .orderBy(col("side"))

  /** Revenue share per category (app.py:120, "pie chart"). */
  def revenueShareByCategory(star: DataFrame): DataFrame = {
    val byCat = star.groupBy(col("category"))
      .agg(sum(col("sales").cast("decimal(27,4)")).cast("double").as("sales"))
    byCat.withColumn("share_pct",
        round(col("sales") / sum(col("sales")).over(Window.partitionBy()) * 100, 6))
      .orderBy(col("category"))
  }

  /** Distinct slicer options, sorted (app.py:74-80). */
  def options(star: DataFrame, column: String, desc: Boolean = false): DataFrame = {
    val c: Column = if (desc) col(column).desc else col(column).asc
    star.select(col(column)).distinct().orderBy(c)
  }
}
