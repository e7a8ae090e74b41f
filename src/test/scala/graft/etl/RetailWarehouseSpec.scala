package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class RetailWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val asOf = java.sql.Date.valueOf("2024-06-01")
  private val superstore = "/root/reference/data/rawdata/Sample - Superstore.csv"

  private def staging = Seq(
    ("O1", "2024-01-05", "C1", "Ann", "Consumer", "P1", "Widget", "Tools", 10.0, 2.0),
    ("O2", "2024-01-06", "C2", "Bob", "Corporate", "P1", "Widget", "Tools", 20.0, 5.0),
    ("O3", "2024-02-07", "C1", "Ann", "Consumer", "P2", "Gadget", "Tech", 30.0, -1.0),
  ).toDF("order_id", "order_date", "customer_id", "customer_name", "segment",
    "product_id", "product_name", "category", "sales", "profit")
    .withColumn("order_date", to_date(col("order_date")))

  test("store dim is skipped when its natural key is absent (column guard)") {
    val dims = RetailWarehouse.buildDims(staging, Map.empty, asOf)
    assert(dims.keySet === Set("dim_customer", "dim_product"))
  }

  test("fact maps natural keys to surrogate keys and drops them") {
    val res = RetailWarehouse.run(staging, asOf)
    assert(res.fact.columns.toSet ===
      Set("order_id", "order_date", "sales", "profit", "customer_key", "product_key"))
    val f = res.fact.orderBy("order_id").collect()
    assert(f.forall(r => !r.isNullAt(r.fieldIndex("customer_key"))))
    // C1 appears twice and maps to the same surrogate key
    assert(f(0).getAs[Long]("customer_key") === f(2).getAs[Long]("customer_key"))
  }

  test("marts aggregate over the star with exact decimal sums") {
    val res = RetailWarehouse.run(staging, asOf)
    val mart = RetailWarehouse.martCategoryAnalysis(res.fact, res.dims("dim_product"))
      .orderBy("category").collect()
    assert(mart.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("Tech", 30.0), ("Tools", 30.0)))
  }

  test("incremental run: changed product category opens a new version") {
    val res0 = RetailWarehouse.run(staging, asOf)
    val changed = staging.withColumn("category",
      when(col("product_id") === "P1", lit("Hardware")).otherwise(col("category")))
    val res1 = RetailWarehouse.run(changed, java.sql.Date.valueOf("2024-07-01"),
      prior = res0.dims)
    val p1 = res1.dims("dim_product").filter(col("product_id") === "P1")
      .orderBy("product_key").collect()
    assert(p1.length === 2)
    assert(p1(0).getAs[Int]("is_current") === 0)
    assert(p1(1).getAs[String]("category") === "Hardware")
    // fact now maps P1 to the NEW surrogate key
    val f1 = RetailWarehouse.buildFact(changed, res1.dims,
      Seq("order_id", "order_date", "customer_id", "product_id", "sales", "profit"))
    val newKey = p1(1).getAs[Long]("product_key")
    assert(f1.filter(col("order_id") === "O1").collect()(0)
      .getAs[Long]("product_key") === newKey)
  }

  test("warehouse roundtrip: fact partitioned by year, dims re-readable as prior") {
    val dir = Files.createTempDirectory("graft_wh").toString
    val res = RetailWarehouse.run(staging, asOf)
    RetailWarehouse.writeWarehouse(res, dir)
    assert(new java.io.File(s"$dir/fact_sales/order_year=2024").exists)
    val prior = RetailWarehouse.readPriorDims(spark, dir)
    assert(prior.keySet === Set("dim_customer", "dim_product"))
    // replay with same data: no new versions
    val res2 = RetailWarehouse.run(staging, asOf, prior)
    assert(res2.dims("dim_customer").count() === res.dims("dim_customer").count())
  }

  test("end-to-end on the reference's actual Superstore CSV") {
    assume(new java.io.File(superstore).exists)
    val res = RetailWarehouse.runFromCsv(spark, superstore, asOf)
    assert(res.staging.count() === 9994)
    // 793 distinct customers (FIXTURES.md A1)
    assert(res.dims("dim_customer").count() === 793)
    // 32 product_ids map to >1 (product_name, category) tuple -> extra versions
    assert(res.dims("dim_product").filter(col("is_current") === 1).count() >= 1862)
    assert(res.fact.count() === 9994)
    // every fact row resolved a current customer key
    assert(res.fact.filter(col("customer_key").isNull).count() === 0)
    val mart = RetailWarehouse.martSalesPerformance(res.fact, res.dims("dim_customer"))
    assert(mart.count() > 0)
  }
}
