package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LineageSpec extends SparkSpec {

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")
  private def customer = spark.read.parquet(s"$sf001/customer.parquet")

  test("projection with rename and arithmetic traces to scan columns") {
    val df = orders.select(col("o_orderkey").as("k"),
      (col("o_totalprice") * 2).as("double_price"),
      lit(1).as("one"))
    assert(Lineage.columnLineage(df) === Seq(
      ("double_price", "orders", "o_totalprice"),
      ("k", "orders", "o_orderkey"),
      ("one", "", "")))
  }

  test("join + aggregate: outputs trace through to each side's table") {
    val df = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(27,4)")).as("rev"),
        count(lit(1)).as("n"))
    assert(Lineage.columnLineage(df) === Seq(
      ("c_mktsegment", "customer", "c_mktsegment"),
      ("n", "", ""),
      ("rev", "orders", "o_totalprice")))
  }

  test("multi-source expression fans out to one row per source") {
    val df = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(concat(col("c_name"), lit(":"), col("o_orderstatus")).as("tag"))
    assert(Lineage.columnLineage(df) === Seq(
      ("tag", "customer", "c_name"),
      ("tag", "orders", "o_orderstatus")))
  }

  test("union merges sources positionally from both branches") {
    val a = orders.select(col("o_orderkey").as("k"))
    val b = customer.select(col("c_custkey").as("k"))
    assert(Lineage.columnLineage(a.unionByName(b)) === Seq(
      ("k", "customer", "c_custkey"),
      ("k", "orders", "o_orderkey")))
  }

  test("window and explode outputs trace to their inputs") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    val df = orders.select(col("o_orderkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"))
    assert(Lineage.columnLineage(df).contains(
      ("prev_price", "orders", "o_totalprice")))

    val ex = orders.select(explode(array(col("o_orderstatus"),
      col("o_orderpriority"))).as("status_or_prio"))
    assert(Lineage.columnLineage(ex) === Seq(
      ("status_or_prio", "orders", "o_orderpriority"),
      ("status_or_prio", "orders", "o_orderstatus")))
  }

  test("rollup grouping keys trace through Expand") {
    val df = orders.rollup(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val l = Lineage.columnLineage(df)
    assert(l.contains(("o_orderstatus", "orders", "o_orderstatus")))
  }

  test("non-file sources report empty lineage without error") {
    val df = spark.range(5).select((col("id") * 2).as("x"))
    assert(Lineage.columnLineage(df) === Seq(("x", "", "")))
  }
}
