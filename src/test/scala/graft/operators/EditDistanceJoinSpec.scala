package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(String, String)], k: Int)
      : Set[(String, String, Int)] = {
    val df = rows.toDF("id", "s")
    df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
  }

  private def fast(rows: Seq[(String, String)], k: Int)
      : Set[(String, String, Int)] =
    EditDistanceJoin.selfJoin(rows.toDF("id", "s"), "s", "id", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet

  test("matches brute force on a crafted set with all three edit kinds") {
    val rows = Seq(
      "a" -> "kitten", "b" -> "sitten", "c" -> "sittin", "d" -> "sitting",
      "e" -> "kitten", // exact duplicate -> dist 0
      "f" -> "kittens", // one insert
      "g" -> "itten", // one delete
      "h" -> "mitten", "i" -> "mutton", "j" -> "button",
      "k" -> "xylophone")
    for (k <- 1 to 3)
      assert(fast(rows, k) === brute(rows, k), s"k=$k")
  }

  test("matches brute force on deterministic pseudo-random strings") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd" // small alphabet -> dense near-matches
    val rows = (0 until 120).map { i =>
      val len = 3 + rnd.nextInt(8)
      f"id$i%03d" -> (0 until len).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for (k <- 1 to 2)
      assert(fast(rows, k) === brute(rows, k), s"k=$k")
  }

  test("strings shorter than k+1 chars take the exact fallback") {
    val rows = Seq("a" -> "x", "b" -> "y", "c" -> "xy", "d" -> "xyz",
      "e" -> "", "f" -> "wxyz")
    for (k <- 1 to 2)
      assert(fast(rows, k) === brute(rows, k), s"k=$k")
  }

  test("the long-string path plans as hash joins, never a cross product") {
    // every string >= k+1 chars: the segment join must be an equi-join
    // (BroadcastHashJoin/SortMergeJoin/ShuffledHashJoin); the only
    // nested-loop in the plan is the deliberately-broadcast short-string
    // fallback joining an EMPTY side
    val rows = (0 until 50).map(i => (f"id$i%02d", s"payload string $i"))
    val df = EditDistanceJoin.selfJoin(rows.toDF("id", "s"), "s", "id", 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("no pair is emitted twice and ids are ordered") {
    val rows = Seq("a" -> "abc", "b" -> "abd", "c" -> "abe")
    val out = EditDistanceJoin.selfJoin(rows.toDF("id", "s"), "s", "id", 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length === out.distinct.length)
    assert(out.forall { case (a, b) => a < b })
  }
}
