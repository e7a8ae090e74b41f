package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")

  test("interpolateDaily: gaps lerp, boundaries hold/backfill") {
    val df = Seq((day(2), 1.0), (day(5), 7.0), (day(7), 3.0))
      .toDF("day", "v")
    val out = Series.interpolateDaily(df, "day", "v")
      .orderBy(col("day"))
      .collect().map(r => (r.getDate(0).toString, r.getBoolean(1),
        r.getDouble(2)))
    assert(out === Array(
      ("2024-01-02", true, 1.0),
      ("2024-01-03", false, 3.0), // 1 + (7-1)*(1/3)
      ("2024-01-04", false, 5.0),
      ("2024-01-05", true, 7.0),
      ("2024-01-06", false, 5.0), // 7 + (3-7)*(1/2)
      ("2024-01-07", true, 3.0)))
  }

  test("interpolateDaily: calendar spans min..max only; single point is itself") {
    val df = Seq((day(10), 4.5)).toDF("day", "v")
    val out = Series.interpolateDaily(df, "day", "v").collect()
    assert(out.length === 1)
    assert(out(0).getDouble(2) === 4.5)
  }

  test("interpolateDailyKeyed: per-key calendars; one key ≡ single-series") {
    val multi = Seq(("a", day(2), 1.0), ("a", day(5), 7.0), ("a", day(7), 3.0),
      ("b", day(10), 2.0), ("b", day(12), 8.0)).toDF("k", "day", "v")
    val keyed = Series.interpolateDailyKeyed(multi, "k", "day", "v")
    // each key fills ONLY its own [min, max] span
    val spans = keyed.groupBy(col("k")).agg(count(lit(1)).as("n"),
        min(col("day")).as("lo"), max(col("day")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDate(2).toString, r.getDate(3).toString)).toSet
    assert(spans === Set(("a", 6L, "2024-01-02", "2024-01-07"),
      ("b", 3L, "2024-01-10", "2024-01-12")))
    // restriction to one key reproduces the single-series result exactly
    val single = Series.interpolateDaily(
      multi.filter(col("k") === "a").drop("k"), "day", "v")
      .orderBy(col("day")).collect()
    val restricted = keyed.filter(col("k") === "a").drop("k")
      .orderBy(col("day")).collect()
    assert(restricted.toSeq === single.toSeq)
    // and the interior gap lerps per key ("b" day 11 = midpoint)
    assert(keyed.filter(col("k") === "b" && col("day") === day(11))
      .head().getDouble(3) === 5.0)
  }

  test("rollingZScore: constant series never flags; spike flags") {
    val rows = (1 to 10).map(i => ("k", day(i), 10.0)) :+
      (("k", day(11), 1000.0))
    val out = Series.rollingZScore(rows.toDF("k", "day", "x"),
        "k", "day", "x", windowRows = 7, threshold = 2.0)
      .orderBy(col("day")).collect()
    // constant prefix: variance 0 -> z null -> not anomalous
    assert(out.take(10).forall(r => r.isNullAt(4) && !r.getBoolean(5)))
    // the spike day: large positive z, flagged
    val spike = out.last
    assert(spike.getDouble(4) > 2.0 && spike.getBoolean(5))
    // trailing window counts saturate at 7
    assert(out.map(_.getLong(3)).toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 7L, 7L, 7L, 7L))
  }

  test("rollingZScore: windows are per key") {
    val rows = Seq(("a", day(1), 1.0), ("a", day(2), 5.0),
      ("b", day(1), 100.0))
    val out = Series.rollingZScore(rows.toDF("k", "day", "x"),
        "k", "day", "x", windowRows = 7, threshold = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(out === Set(("a", 1L), ("a", 2L), ("b", 1L)))
  }

  test("rollingZScore: z is partitioning-invariant (decimal-exact sums)") {
    val rows = (1 to 30).map(i => ("k", day(i), i * 0.37 + (i % 5) * 2.11))
    val df1 = rows.toDF("k", "day", "x").repartition(1)
    val df8 = rows.toDF("k", "day", "x").repartition(8)
    val z1 = Series.rollingZScore(df1, "k", "day", "x").orderBy(col("day"))
      .collect().map(r => if (r.isNullAt(4)) null else r.getDouble(4))
    val z8 = Series.rollingZScore(df8, "k", "day", "x").orderBy(col("day"))
      .collect().map(r => if (r.isNullAt(4)) null else r.getDouble(4))
    assert(z1.toSeq === z8.toSeq)
  }

  test("ewmaHalf: matches the integer reference recurrence, per key") {
    val vals = Seq(390.72, 113.51, 430.65, 206.98, 99.99, 1234.5678, 0.0, 7.25,
      3.0, 42.42)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", day(i + 1), v) }
      .toDF("k", "day", "x")
      .unionByName(Seq(("b", day(1), 100.0), ("b", day(2), 50.0))
        .toDF("k", "day", "x"))
    val got = Series.ewmaHalf(df, "k", "day", "x", windowRows = 8)
      .orderBy(col("k"), col("day")).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    def ref(xs: Seq[Double]): Seq[Double] =
      xs.indices.map { t =>
        val total = (0 until 8).map { i =>
          val x = if (t - i >= 0) Math.round(xs(t - i) * 10000) else 0L
          x * (1L << (7 - i))
        }.sum
        total.toDouble / 2560000.0
      }
    val expect = ref(vals).map(("a", _)) ++ ref(Seq(100.0, 50.0)).map(("b", _))
    assert(got.toSeq === expect)
  }

  test("ewmaHalf: bit-identical across partitionings") {
    val df = (1 to 30).map(i => ("k", day(i), i * 1.2345)).toDF("k", "day", "x")
    def run(p: Int) = Series.ewmaHalf(df.repartition(p), "k", "day", "x")
      .orderBy(col("day")).collect().map(_.getDouble(3)).toSeq
    assert(run(1) === run(7))
  }

  test("ewmaHalf: out-of-bound values raise instead of silently wrapping") {
    // default non-ANSI long arithmetic wraps; the explicit guard must
    // raise loudly for values past the exact-integer bound
    val big = Long.MaxValue / 255L / 10000L * 2.0 // past the W=8 bound
    val df = Seq(("k", day(1), 1.0), ("k", day(2), big)).toDF("k", "day", "x")
    val e = intercept[Exception] {
      Series.ewmaHalf(df, "k", "day", "x", windowRows = 8).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e).contains("exceeds the exact-integer bound"))
    // in-bound values are untouched by the guard
    val ok = Series.ewmaHalf(
      Seq(("k", day(1), 4.0)).toDF("k", "day", "x"), "k", "day", "x",
      windowRows = 1).collect()
    assert(ok.head.getDouble(3) === 2.0)
  }
}
