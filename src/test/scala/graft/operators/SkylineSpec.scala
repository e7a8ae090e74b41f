package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Skyline.skyline2D]] vs brute-force dominance, plus the grid edge
  * cases (ties, duplicates, negatives, bucket-count invariance).
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: DataFrame, xc: String, yc: String): Set[(Long, Long)] = {
    val pts = df.select(col(xc).cast("long"), col(yc).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pts.filter { case (px, py) =>
      !pts.exists { case (qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.toSet
  }

  private def sky(df: DataFrame, xc: String, yc: String, b: Int = 64) =
    Skyline.skyline2D(df, xc, yc, b)
      .select(col(xc).cast("long"), col(yc).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("crafted: ties, duplicates, interior points") {
    val df = Seq((1L, 9L), (5L, 5L), (5L, 5L), (9L, 1L), (3L, 3L),
      (5L, 4L), (1L, 1L), (9L, 1L)).toDF("x", "y")
    val got = Skyline.skyline2D(df, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // duplicates of skyline points all survive
    assert(got.count(_ == ((5L, 5L))) === 2)
    assert(got.count(_ == ((9L, 1L))) === 2)
    assert(got.toSet === Set((1L, 9L), (5L, 5L), (9L, 1L)))
  }

  test("matches brute force on real data (users: events × active days)") {
    val ev = graft.Tables.events(spark, sf001)
    val users = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_days"))
    assert(sky(users, "n_events", "n_days") ===
      brute(users, "n_events", "n_days"))
  }

  test("bucket-count invariance, including the degenerate single bucket") {
    val ev = graft.Tables.events(spark, sf001)
    val users = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("n_days"))
    val b64 = sky(users, "n_events", "n_days", 64)
    assert(sky(users, "n_events", "n_days", 1) === b64)
    assert(sky(users, "n_events", "n_days", 7) === b64)
  }

  test("negative coordinates and nulls") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (-5L, -1L), (-1L, -5L), (-3L, -3L), (-6L, -6L), (null, 99L),
      (99L, null)).toDF("x", "y")
    assert(sky(df, "x", "y") === Set((-5L, -1L), (-1L, -5L), (-3L, -3L)))
  }

  test("single point and fully-dominated chains") {
    assert(sky(Seq((7L, 7L)).toDF("x", "y"), "x", "y") === Set((7L, 7L)))
    val chain = (1L to 10L).map(i => (i, i)).toDF("x", "y")
    assert(sky(chain, "x", "y") === Set((10L, 10L)))
  }

  test("non-integral dims are rejected") {
    val df = Seq((1.0, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Skyline.skyline2D(df, "x", "y")
    }
  }
}
