package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rollup(df: DataFrame): DataFrame =
    df.groupBy($"g")
      .agg(count(lit(1)).as("n"),
        sum($"v".cast("decimal(27,4)")).as("s"))

  test("mergeRollup over any history split equals the full recompute") {
    val facts = (1 to 500).map(i => (i % 7, i * 0.1 + 0.03)).toDF("g", "v")
    val full = rollup(facts).orderBy("g")
      .select($"g", $"n", $"s".cast("double"))
      .collect().toSeq
    for (cut <- Seq(0, 100, 250, 499, 500)) {
      val prior = rollup(facts.limit(cut))
      val delta = rollup(facts.except(facts.limit(cut)))
      // except() is set semantics; rows here are distinct by construction
      val merged = IncrementalAgg.mergeRollup(prior, delta, Seq("g"), Seq("n", "s"))
        .orderBy("g").select($"g", $"n", $"s".cast("double"))
        .collect().toSeq
      assert(merged === full, s"cut=$cut")
    }
  }

  test("mergeRollup rejects measures missing from either side") {
    val a = Seq((1, 2L)).toDF("g", "n")
    val b = Seq((1, 3L, 4L)).toDF("g", "n", "extra")
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeRollup(a, b, Seq("g"), Seq("n", "extra"))
    }
  }
}
