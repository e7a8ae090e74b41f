package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Quantiles]]: exact percentiles from additive histogram state.
  * The load-bearing property is split invariance — merged state derives
  * BIT-IDENTICAL quantiles no matter how history was batched, which is
  * what lets the maintenance path replace the full recompute.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed: discrete quantile definition on 1..10") {
    val state = Quantiles.histogramState((1 to 10).toDF("v"), "v")
    val q = Quantiles.quantilesFromState(state, Seq(50, 90, 100))
      .orderBy("pct").collect()
    // smallest v with cum*100 >= p*10: p50 → cum>=5 → 5; p90 → 9; p100 → 10
    assert(q.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((50, 5L), (90, 9L), (100, 10L)))
  }

  test("duplicates weight the CDF; nulls are dropped") {
    val vals = Seq[Integer](1, 1, 1, 1, 1, 1, 1, 1, 1, 100, null)
    val state = Quantiles.histogramState(vals.toDF("v"), "v")
    val q = Quantiles.quantilesFromState(state, Seq(50, 95))
      .orderBy("pct").collect()
    // N=10 after the null drop: p50 → cum>=5 → 1; p95 → cum>=9.5 → 100
    assert(q.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((50, 1L), (95, 100L)))
  }

  test("merge ≡ full recompute, bit-identical for any batching") {
    val docs = spark.read.parquet(s"$sf001/orders.parquet")
      .select((col("o_totalprice").cast("bigint")).as("v"),
        col("o_orderkey"))
    val full = Quantiles.quantilesFromState(
      Quantiles.histogramState(docs, "v"), Seq(5, 50, 99))
      .orderBy("pct").collect().toSeq
    for (parts <- Seq(2, 5)) {
      val merged = (0 until parts)
        .map(i => Quantiles.histogramState(
          docs.filter(pmod(col("o_orderkey"), lit(parts)) === i), "v"))
        .reduce(Quantiles.mergeHistogram)
      val q = Quantiles.quantilesFromState(merged, Seq(5, 50, 99))
        .orderBy("pct").collect().toSeq
      assert(q === full, s"$parts-way split diverged")
    }
  }

  test("state is domain-sized: one row per distinct value") {
    val docs = spark.read.parquet(s"$sf001/lineitem.parquet")
    val state = Quantiles.histogramState(docs, "l_quantity")
    assert(state.count() ===
      docs.filter(col("l_quantity").isNotNull)
        .select(col("l_quantity").cast("bigint")).distinct().count())
    assert(state.agg(sum("cnt")).head().getLong(0) === docs.count())
  }

  test("percentile bounds are validated") {
    val state = Quantiles.histogramState((1 to 3).toDF("v"), "v")
    intercept[IllegalArgumentException] {
      Quantiles.quantilesFromState(state, Seq(0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.quantilesFromState(state, Seq(101))
    }
  }
}
