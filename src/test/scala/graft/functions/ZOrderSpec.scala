package graft.functions

import graft.SparkSpec
import graft.sources.ParquetMeta
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: hand-computed values") {
    // a=3 (bits 0,1 -> z bits 0,2 = 5); b=5 (bits 0,2 -> z bits 1,5 = 34)
    assert(ZOrderExpression.interleave(3L, 5L) === 39L)
    assert(ZOrderExpression.interleave(0L, 0L) === 0L)
    assert(ZOrderExpression.interleave(1L, 0L) === 1L)
    assert(ZOrderExpression.interleave(0L, 1L) === 2L)
    // max 31-bit inputs stay positive
    assert(ZOrderExpression.interleave(0x7FFFFFFFL, 0x7FFFFFFFL) > 0L)
  }

  test("native codegen path equals the interpreted reference on random inputs") {
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(1000)((rng.nextInt(Int.MaxValue), rng.nextInt(Int.MaxValue)))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ZOrderExpression.zValue($"a", $"b").as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) ===
        ZOrderExpression.interleave(r.getInt(0).toLong, r.getInt(1).toLong))
    }
  }

  test("zValue rejects non-integral inputs") {
    val e = intercept[Exception] {
      Seq(("x", 1)).toDF("a", "b")
        .select(ZOrderExpression.zValue($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("z_value") || e.getMessage.contains("DATATYPE"))
  }

  test("z-ordered layout prunes a box predicate's row groups vs a single-column sort") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // two uncorrelated uniform dimensions, like (partkey, suppkey)
    val n = 200000
    val df = spark.range(n.toLong).select(
      pmod(xxhash64($"id"), lit(1024)).cast("int").as("x"),
      pmod(xxhash64($"id" + 1000000), lit(1024)).cast("int").as("y"))
    def write(path: String, sorted: org.apache.spark.sql.DataFrame): Unit =
      sorted.coalesce(1).write
        .option("parquet.block.size", 64 * 1024) // many small row groups
        .mode("overwrite").parquet(path)
    write(s"$dir/z", df.orderBy(ZOrderExpression.zValue($"x", $"y")))
    write(s"$dir/x", df.orderBy($"x"))
    def matching(path: String, dim: String, lo: Long, hi: Long): (Int, Int) = {
      val ranges = ParquetMeta.rowGroupRanges(spark, path, Seq("x", "y"))
      val hit = ranges.count { m =>
        val (mn, mx) = m(dim); mn <= hi && mx >= lo
      }
      (hit, ranges.size)
    }
    // The win z-order buys: a predicate on the SECOND dimension still
    // prunes. The x-sort leaves y shuffled through every row group (zero
    // pruning); the z-layout keeps both dimensions localized per group.
    val (zY, zTotal) = matching(s"$dir/z", "y", 400, 460)
    val (xY, xTotal) = matching(s"$dir/x", "y", 400, 460)
    assert(zTotal > 8 && xTotal > 8, s"need multiple row groups, got $zTotal/$xTotal")
    assert(xY === xTotal, s"x-sort should not prune y at all: $xY/$xTotal")
    assert(zY * 2 <= xY,
      s"z-order should prune y at least 2x better: z $zY/$zTotal vs x $xY/$xTotal")
    // ...while still pruning the first dimension (imperfectly — that is
    // the trade: good on all dimensions instead of perfect on one).
    val (zX, _) = matching(s"$dir/z", "x", 100, 160)
    assert(zX * 2 <= zTotal, s"z-order should still prune x: $zX/$zTotal")
  }
}
