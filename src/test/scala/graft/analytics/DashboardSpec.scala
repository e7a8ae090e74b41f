package graft.analytics

import graft.SparkSpec
import graft.etl.RetailWarehouse
import org.apache.spark.sql.functions._

/** Dashboard parity over the star schema built from the reference's real
  * Superstore CSV: every chart in /root/reference/dashboard/app.py has a
  * Spark twin here, and the KPI totals must equal a direct aggregation of
  * the raw staging data (joins must not drop or duplicate rows).
  */
class DashboardSpec extends SparkSpec {

  private val superstore = "/root/reference/data/rawdata/Sample - Superstore.csv"
  private lazy val res = RetailWarehouse.runFromCsv(
    spark, superstore, java.sql.Date.valueOf("2024-06-01"))
  private lazy val star = Dashboard.starJoin(
    res.fact, res.dims("dim_customer"), res.dims("dim_product")).persist()

  private def available = new java.io.File(superstore).exists

  test("star join preserves fact cardinality (no fan-out, no loss)") {
    assume(available)
    assert(star.count() === 9994)
  }

  test("KPI totals equal raw staging aggregates") {
    assume(available)
    val k = Dashboard.kpis(star).collect()(0)
    val raw = res.staging.agg(
      sum(col("sales").cast("decimal(27,4)")).cast("double"),
      sum(col("profit").cast("decimal(27,4)")).cast("double"),
      count(lit(1))).collect()(0)
    assert(k.getDouble(0) === raw.getDouble(0))
    assert(k.getDouble(1) === raw.getDouble(1))
    assert(k.getLong(2) === raw.getLong(2))
    assert(k.getDouble(3) === raw.getDouble(0) / raw.getLong(2))
  }

  test("fillna defaults then slicing mirrors the app's filter flow") {
    assume(available)
    val sliced = Dashboard.slice(Dashboard.withDefaults(star),
      Map("segment" -> "Consumer"))
    assert(sliced.count() > 0)
    assert(sliced.filter(col("segment") =!= "Consumer").count() === 0)
  }

  test("share percentages sum to 100") {
    assume(available)
    val total = Dashboard.revenueShareByCategory(Dashboard.withDefaults(star))
      .agg(sum(col("share_pct"))).collect()(0).getDouble(0)
    assert(math.abs(total - 100.0) < 1e-6)
  }

  test("category-vs-rest partitions the whole market") {
    assume(available)
    val sides = Dashboard.categoryVsRest(Dashboard.withDefaults(star), "Jewellery")
      .collect()
    assert(sides.map(_.getString(0)).toSet === Set("selected", "rest"))
    val k = Dashboard.kpis(star).collect()(0)
    assert(sides.map(_.getDouble(1)).sum === k.getDouble(0))
  }

  test("option lists are distinct and sorted") {
    assume(available)
    val opts = Dashboard.options(Dashboard.withDefaults(star), "category")
      .collect().map(_.getString(0)).toSeq
    assert(opts === opts.sorted && opts.distinct === opts)
  }
}
