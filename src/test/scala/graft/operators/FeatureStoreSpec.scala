package graft.operators

import graft.SparkSpec
import graft.operators.FeatureStore.FeatureTable
import org.apache.spark.sql.functions._

/** [[FeatureStore.pointInTime]]: leakage-freedom (no attached feature
  * later than the spine time), correctness on a crafted timeline, and
  * feature-order invariance.
  */
class FeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val spine = Seq(
    (1L, 10L, ts("2024-01-05 00:00:00")),
    (2L, 10L, ts("2024-01-01 00:00:00")),
    (3L, 20L, ts("2024-01-05 00:00:00")))
    .toDF("row_id", "entity", "label_ts")

  private val balance = Seq(
    (10L, ts("2024-01-02 00:00:00"), 100.0),
    (10L, ts("2024-01-04 00:00:00"), 200.0),
    (10L, ts("2024-01-06 00:00:00"), 999.0), // future for every spine row
    (20L, ts("2024-01-01 00:00:00"), 50.0))
    .toDF("entity", "b_ts", "balance")

  private val tier = Seq(
    (10L, ts("2024-01-03 00:00:00"), "gold"))
    .toDF("entity", "t_ts", "tier")

  test("crafted timeline: latest-at-or-before per feature, null when none") {
    val out = FeatureStore.pointInTime(spine, "label_ts", Seq(
        FeatureTable(balance, Seq("entity"), "b_ts", Seq("b_ts", "balance")),
        FeatureTable(tier, Seq("entity"), "t_ts", Seq("tier"))))
      .orderBy("row_id").collect()
    // row 1 (entity 10 @ Jan-5): balance 200 (Jan-4), tier gold (Jan-3)
    assert(out(0).getAs[Double]("balance") === 200.0)
    assert(out(0).getAs[String]("tier") === "gold")
    // row 2 (entity 10 @ Jan-1): no balance yet, no tier yet
    assert(out(1).isNullAt(out(1).fieldIndex("balance")))
    assert(out(1).isNullAt(out(1).fieldIndex("tier")))
    // row 3 (entity 20 @ Jan-5): balance 50, tier null (other entity's)
    assert(out(2).getAs[Double]("balance") === 50.0)
    assert(out(2).isNullAt(out(2).fieldIndex("tier")))
  }

  test("no leakage: every attached feature ts <= spine ts") {
    val out = FeatureStore.pointInTime(spine, "label_ts", Seq(
      FeatureTable(balance, Seq("entity"), "b_ts", Seq("b_ts", "balance"))))
    assert(out.filter(col("b_ts") > col("label_ts")).count() === 0)
    assert(out.agg(max(col("balance"))).head().getDouble(0) < 999.0)
  }

  test("feature order does not change the assembled rows") {
    val fs = Seq(
      FeatureTable(balance, Seq("entity"), "b_ts", Seq("balance")),
      FeatureTable(tier, Seq("entity"), "t_ts", Seq("tier")))
    val a = FeatureStore.pointInTime(spine, "label_ts", fs)
      .select("row_id", "balance", "tier").orderBy("row_id").collect().toSeq
    val b = FeatureStore.pointInTime(spine, "label_ts", fs.reverse)
      .select("row_id", "balance", "tier").orderBy("row_id").collect().toSeq
    assert(a === b)
  }

  test("single feature ≡ a direct backward as-of join") {
    val viaStore = FeatureStore.pointInTime(spine, "label_ts", Seq(
        FeatureTable(balance, Seq("entity"), "b_ts", Seq("balance"))))
      .orderBy("row_id").collect().toSeq
    val direct = AsOfJoin.backward(spine, balance, Seq("entity"),
        "label_ts", "b_ts", Seq("balance"), prefix = "")
      .orderBy("row_id").collect().toSeq
    assert(viaStore === direct)
  }

  test("colliding prefixed payload names are rejected up front") {
    val e = intercept[IllegalArgumentException] {
      FeatureStore.pointInTime(spine, "label_ts", Seq(
        FeatureTable(balance, Seq("entity"), "b_ts", Seq("balance")),
        FeatureTable(balance, Seq("entity"), "b_ts", Seq("balance"))))
    }
    assert(e.getMessage.contains("collide"))
  }
}
