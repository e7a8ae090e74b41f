package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, -7L), (2L, 0L), (3L, 5L), (4L, 10L), (5L, 99L),
  ).toDF("p_id", "p")

  private val intervals = Seq(
    (10L, -10L, 0L),  // negative domain, point on inclusive end
    (20L, 0L, 9L),    // point on inclusive start
    (30L, 4L, 42L),   // spans many buckets
    (40L, 50L, 60L),  // matches nothing
  ).toDF("iv_id", "s", "e")

  private def naive(p: org.apache.spark.sql.DataFrame,
      iv: org.apache.spark.sql.DataFrame) =
    p.crossJoin(iv).filter(col("p") >= col("s") && col("p") <= col("e"))

  test("bucketed result equals the naive BETWEEN join, boundaries inclusive") {
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", w)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = naive(points, intervals)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, s"bucketWidth=$w")
    }
    // sanity on content, not just equivalence with naive
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 3L)
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (3L, 30L), (4L, 30L)))
  }

  test("intervalOverlap equals the naive overlap join, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    val a = (1L to 120L).map { i =>
      val s0 = rnd.between(-50L, 200L); (i, s0, s0 + rnd.between(0L, 30L))
    }.toDF("a_id", "a_s", "a_e")
    val b = (1L to 90L).map { i =>
      val s0 = rnd.between(-60L, 220L); (i, s0, s0 + rnd.between(0L, 45L))
    }.toDF("b_id", "b_s", "b_e")
    val want = a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (w <- Seq(1L, 5L, 17L, 1000L)) {
      val got = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e", w)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // sequence (not set) compare: a pair spanning several shared buckets
      // must still surface EXACTLY once
      assert(got === want, s"bucketWidth=$w")
    }
  }

  test("extreme magnitudes bucket exactly: epoch-nano scale and Long.MinValue edge") {
    // above 2^53 a double quotient collapses adjacent buckets; the
    // integral floorDiv must keep them distinct and the join exact
    val base = 1700000000000000000L // ~epoch nanos, > 2^53
    val p = Seq((1L, base + 5L), (2L, base + 300L), (3L, Long.MinValue + 2L))
      .toDF("p_id", "p")
    val iv = Seq(
      (10L, base, base + 10L),            // contains base+5 only
      (20L, base + 250L, base + 400L),    // contains base+300 only
      (30L, Long.MinValue, Long.MinValue + 5L), // near-underflow edge
    ).toDF("iv_id", "s", "e")
    for (w <- Seq(3L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(p, iv, "p", "s", "e", w)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 10L), (2L, 20L), (3L, 30L)), s"bucketWidth=$w")
    }
  }

  test("a reserved _rj_bucket column on either input is rejected, not clobbered") {
    val bad = points.withColumn("_rj_bucket", lit(1L))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(bad, intervals, "p", "s", "e", 3L)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("overlapping point/interval column names are rejected, not made ambiguous") {
    val iv = intervals.withColumnRenamed("s", "p") // collides with points.p
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, iv, "p", "p", "e", 3L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("an open-ended sentinel interval fails loudly, not with an OOM/sequence cap") {
    val iv = Seq((1L, 0L, Long.MaxValue / 2)).toDF("iv_id", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, iv, "p", "s", "e", 10L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("open-ended sentinel")), e.getMessage)
    // a wide-but-bounded interval under the cap still works
    val ok = Seq((1L, 0L, 100000L)).toDF("iv_id", "s", "e")
    assert(RangeJoin.pointInInterval(points, ok, "p", "s", "e", 10L).count() === 4L)
    // a full-Long-range sentinel whose long span WRAPS negative must still
    // trip the guard (the check runs in double, which cannot wrap)
    val wrap = Seq((1L, Long.MinValue + 10, Long.MaxValue - 10)).toDF("iv_id", "s", "e")
    val e2 = intercept[Exception] {
      RangeJoin.pointInInterval(points, wrap, "p", "s", "e", 1L).count()
    }
    assert(messages(e2).exists(_.contains("open-ended sentinel")), e2.getMessage)
  }

  test("overlapping intervals multiply matches; no dedup is imposed") {
    val iv = Seq((1L, 0L, 10L), (2L, 0L, 10L)).toDF("iv_id", "s", "e")
    val p = Seq((1L, 5L)).toDF("p_id", "p")
    assert(RangeJoin.pointInInterval(p, iv, "p", "s", "e", 4L).count() === 2L)
  }

  test("random points and intervals: bucketed equals naive for any width") {
    val genCase = for {
      pts <- Gen.listOfN(12, Gen.choose(-50L, 50L))
      ivs <- Gen.listOfN(6, for {
        a <- Gen.choose(-50L, 50L); len <- Gen.choose(0L, 30L)
      } yield (a, a + len))
      w <- Gen.choose(1L, 25L)
    } yield (pts, ivs, w)
    val prop = Prop.forAll(genCase) { case (pts, ivs, w) =>
      val p = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("p_id", "p")
      val iv = ivs.zipWithIndex.map { case ((s0, e0), i) => (i.toLong, s0, e0) }
        .toDF("iv_id", "s", "e")
      val got = RangeJoin.pointInInterval(p, iv, "p", "s", "e", w)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = naive(p, iv).select("p_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("pointInBox2D matches the brute-force containment join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val boxes = (0 until 40).map { i =>
      val x1 = rnd.nextInt(900).toLong; val y1 = rnd.nextInt(900).toLong
      (i.toLong, x1, y1, x1 + rnd.nextInt(120), y1 + rnd.nextInt(120))
    }
    val pdf = pts.toDF("pid", "px", "py")
    val bdf = boxes.toDF("bid", "x1", "y1", "x2", "y2")
    val got = RangeJoin.pointInBox2D(pdf, bdf, "px", "py",
        "x1", "y1", "x2", "y2", cellWidth = 64, cellHeight = 64)
      .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val expected = (for {
      (pid, px, py) <- pts
      (bid, x1, y1, x2, y2) <- boxes
      if px >= x1 && px <= x2 && py >= y1 && py <= y2
    } yield (pid, bid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("pointInBox2D handles negative coordinates (floor-aligned cells)") {
    import spark.implicits._
    val pdf = Seq((1L, -5L, -5L), (2L, -70L, 10L), (3L, 0L, 0L))
      .toDF("pid", "px", "py")
    val bdf = Seq((10L, -80L, -10L, 0L, 20L)).toDF("bid", "x1", "y1", "x2", "y2")
    val got = RangeJoin.pointInBox2D(pdf, bdf, "px", "py",
        "x1", "y1", "x2", "y2", 64, 64)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L))
  }

  test("inverted intervals and boxes match nothing and never explode") {
    import spark.implicits._
    // end << start: a descending sequence() would fan out ~10^9 rows
    // before the containment filter saw any of them — the drop must
    // happen BEFORE the explode, instantly
    val pts = Seq((1L, 5L)).toDF("p_id", "p")
    val iv = Seq((1L, 1000000000L, 0L), (2L, 3L, 9L)).toDF("iv_id", "s", "e")
    val got = RangeJoin.pointInInterval(pts, iv, "p", "s", "e",
        bucketWidth = 1)
      .select("iv_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L))
    val pdf = Seq((1L, 5L, 5L)).toDF("pid", "px", "py")
    val bdf = Seq((1L, 1000000000L, 0L, 0L, 10L), (2L, 0L, 0L, 10L, 10L))
      .toDF("bid", "x1", "y1", "x2", "y2")
    val got2 = RangeJoin.pointInBox2D(pdf, bdf, "px", "py",
        "x1", "y1", "x2", "y2", 1, 1)
      .select("bid").collect().map(_.getLong(0)).toSeq
    assert(got2 === Seq(2L))
  }

  test("pointInBox2D cell-product cap trips loudly on a degenerate box") {
    import spark.implicits._
    val pdf = Seq((1L, 0L, 0L)).toDF("pid", "px", "py")
    val bdf = Seq((1L, 0L, 0L, 1000000L, 1000000L))
      .toDF("bid", "x1", "y1", "x2", "y2")
    val e = intercept[Exception] {
      RangeJoin.pointInBox2D(pdf, bdf, "px", "py", "x1", "y1", "x2", "y2",
        cellWidth = 4, cellHeight = 4, maxCellsPerBox = 256).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("grid cells")))
  }
}
