package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[KmvSketch]]: exactness below k, merge/split invariance (the
  * mergeable-state contract), estimator accuracy, and determinism.
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  test("below k distinct values the sketch is EXACT") {
    val df = (1 to 40).map(i => ("g", i.toLong)).toDF("grp", "v")
    val est = KmvSketch.estimate(
      KmvSketch.state(df, Seq("grp"), "v", K), Seq("grp"), K)
    assert(est.head().getAs[Long]("est") === 40L)
  }

  test("estimate within KMV error bounds on real data") {
    val ev = graft.Tables.events(spark, sf001)
    val est = KmvSketch.estimate(
        KmvSketch.state(ev, Seq("event_type"), "user_id", K),
        Seq("event_type"), K)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      val e = est(g)
      // k=64 → standard error ~12.7%; allow 4 sigma
      assert(math.abs(e - n).toDouble / n < 0.51,
        s"$g: est $e vs exact $n")
    }
  }

  test("merge ≡ recompute, invariant under 2/5-way splits") {
    val ev = graft.Tables.events(spark, sf001)
    val full = KmvSketch.estimate(
        KmvSketch.state(ev, Seq("event_type"), "user_id", K),
        Seq("event_type"), K)
      .orderBy("event_type").collect().toSeq
    for (parts <- Seq(2, 5)) {
      val merged = (0 until parts)
        .map(i => KmvSketch.state(
          ev.filter(pmod(col("event_id"), lit(parts)) === i),
          Seq("event_type"), "user_id", K))
        .reduce(KmvSketch.mergeState(_, _, Seq("event_type"), K))
      val est = KmvSketch.estimate(merged, Seq("event_type"), K)
        .orderBy("event_type").collect().toSeq
      assert(est === full, s"$parts-way split diverged")
    }
  }

  test("state size is bounded by k per group") {
    val ev = graft.Tables.events(spark, sf001)
    val st = KmvSketch.state(ev, Seq("event_type"), "user_id", K)
    val sizes = st.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= K))
  }

  test("duplicates don't inflate the sketch; nulls are dropped") {
    val df = (Seq.fill(100)(("g", Some(7L))) ++ Seq(("g", None)))
      .toDF("grp", "v")
    val est = KmvSketch.estimate(
      KmvSketch.state(df, Seq("grp"), "v", K), Seq("grp"), K)
    assert(est.head().getAs[Long]("est") === 1L)
  }

  test("k < 2 is rejected") {
    val df = Seq(("g", 1L)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      KmvSketch.state(df, Seq("grp"), "v", 1)
    }
  }
}
