package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame) =
    AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv"))
      .orderBy("id")

  private def runNative(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame) =
    AsOfJoin.backwardNative(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv"))
      .orderBy("id")

  test("backward picks the latest right row at or before each left time") {
    val left = Seq((1L, "a", 5L), (2L, "a", 2L), (3L, "b", 9L)).toDF("id", "k", "lt")
    val right = Seq(("a", 1L, "r1"), ("a", 3L, "r3"), ("a", 7L, "r7"), ("b", 9L, "rb"))
      .toDF("k", "rt", "rv")
    val got = run(left, right).collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString).orNull, if (r.isNullAt(4)) null else r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, "3", "r3"),   // latest at-or-before 5 is t=3 (t=7 is future)
      (2L, "1", "r1"),   // latest at-or-before 2 is t=1
      (3L, "9", "rb")))  // tie: right at the same instant matches (<=)
  }

  test("left rows with no prior right row keep null payload (left join)") {
    val left = Seq((1L, "a", 1L), (2L, "zzz", 5L)).toDF("id", "k", "lt")
    val right = Seq(("a", 3L, "r3")).toDF("k", "rt", "rv")
    val got = run(left, right).collect()
    assert(got.length === 2)
    assert(got.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("equal-time right duplicates resolve to the max payload deterministically") {
    val left = Seq((1L, "a", 5L)).toDF("id", "k", "lt")
    val right = Seq(("a", 3L, "alpha"), ("a", 3L, "omega")).toDF("k", "rt", "rv")
    val got = run(left, right).collect()
    assert(got.head.getString(4) === "omega")
  }

  test("result is partition-count independent") {
    val left = (1L to 100L).map(i => (i, s"k${i % 7}", i)).toDF("id", "k", "lt")
    val right = (1L to 50L).map(i => (s"k${i % 7}", i * 2 - 1, s"v$i")).toDF("k", "rt", "rv")
    val a = run(left.repartition(1), right.repartition(1)).collect().map(_.toSeq).toSeq
    val b = run(left.repartition(13), right.repartition(5)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.length === 100)
  }

  test("forward picks the earliest right row at or after each left time") {
    val left = Seq((1L, "a", 5L), (2L, "a", 8L), (3L, "b", 9L)).toDF("id", "k", "lt")
    val right = Seq(("a", 3L, "r3"), ("a", 5L, "r5"), ("a", 7L, "r7"), ("b", 9L, "rb"))
      .toDF("k", "rt", "rv")
    val got = AsOfJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.toString).orNull,
        if (r.isNullAt(4)) null else r.getString(4)))
    assert(got.toSeq === Seq(
      (1L, "5", "r5"),   // tie: right at the same instant matches (>=)
      (2L, null, null),  // nothing at-or-after 8
      (3L, "9", "rb")))
    // equal-time right duplicates resolve to the min payload
    val dup = Seq(("a", 5L, "omega"), ("a", 5L, "alpha")).toDF("k", "rt", "rv")
    val one = AsOfJoin.forward(Seq((1L, "a", 1L)).toDF("id", "k", "lt"),
      dup, Seq("k"), "lt", "rt", Seq("rv")).collect()
    assert(one.head.getString(3) === "alpha")
  }

  test("null times never match: null-time lefts get null, null-time rights are invisible") {
    val left = Seq((1L, "a", Some(5L)), (2L, "a", None)).toDF("id", "k", "lt")
    val right = Seq(("a", Some(3L), "r3"), ("a", None, "rnull")).toDF("k", "rt", "rv")
    for (run <- Seq(
        AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")),
        AsOfJoin.backwardNative(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")),
        AsOfJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")))) {
      val rows = run.orderBy("id").collect()
      // the null-time left row matches nothing in any direction/impl
      assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))
      // the null-time right row is never returned as a match
      assert(rows.forall(r => r.isNullAt(4) || r.getString(4) != "rnull"))
    }
  }

  test("null keys never match: null-key lefts get null, null-key rights are invisible") {
    // SQL join semantics: null = null is never true — a null-key right
    // row must not become the match for null-key left rows (the natural
    // ordering and Window.partitionBy would otherwise pair them up).
    val left = Seq((1L, Some("a"), 5L), (2L, None, 5L)).toDF("id", "k", "lt")
    val right = Seq((Some("a"), 3L, "r3"), (None, 1L, "rnull"))
      .toDF("k", "rt", "rv")
    for (res <- Seq(
        AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")),
        AsOfJoin.backwardNative(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")),
        AsOfJoin.forward(left, right, Seq("k"), "lt", "rt", Seq("rt", "rv")))) {
      val rows = res.orderBy("id").collect()
      // non-null-key left still matches normally (backward forms)
      assert(rows(0).isNullAt(4) || rows(0).getString(4) == "r3")
      // the null-key left row matches nothing
      assert(rows(1).isNullAt(3) && rows(1).isNullAt(4))
      // the null-key right row is never returned as a match
      assert(rows.forall(r => r.isNullAt(4) || r.getString(4) != "rnull"))
    }
  }

  test("unorderable payload types fail at construction with a clear message") {
    val left = Seq((1L, "a", 5L)).toDF("id", "k", "lt")
    val right = Seq(("a", 3L, Map("x" -> 1))).toDF("k", "rt", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backwardNative(left, right, Seq("k"), "lt", "rt", Seq("rv"))
    }
    assert(e.getMessage.contains("orderable"))
  }

  test("native operator equals the composed form on all scenarios") {
    // scenario fixtures from the composed tests
    val fixtures = Seq(
      (Seq((1L, "a", 5L), (2L, "a", 2L), (3L, "b", 9L)).toDF("id", "k", "lt"),
        Seq(("a", 1L, "r1"), ("a", 3L, "r3"), ("a", 7L, "r7"), ("b", 9L, "rb"))
          .toDF("k", "rt", "rv")),
      (Seq((1L, "a", 1L), (2L, "zzz", 5L)).toDF("id", "k", "lt"),
        Seq(("a", 3L, "r3")).toDF("k", "rt", "rv")),
      (Seq((1L, "a", 5L)).toDF("id", "k", "lt"),
        Seq(("a", 3L, "alpha"), ("a", 3L, "omega")).toDF("k", "rt", "rv")),
      // dense random-ish data across several keys and repeated times
      ((1L to 200L).map(i => (i, s"k${i % 11}", i % 37)).toDF("id", "k", "lt"),
        (1L to 80L).map(i => (s"k${i % 11}", i % 29, s"v$i")).toDF("k", "rt", "rv")))
    fixtures.foreach { case (l, r) =>
      assert(runNative(l, r).collect().map(_.toSeq).toSeq ===
        run(l, r).collect().map(_.toSeq).toSeq)
    }
  }

  test("native operator plans through AsOfJoinExec and is partition independent") {
    val left = (1L to 100L).map(i => (i, s"k${i % 7}", i)).toDF("id", "k", "lt")
    val right = (1L to 50L).map(i => (s"k${i % 7}", i * 2 - 1, s"v$i")).toDF("k", "rt", "rv")
    val df = runNative(left.repartition(13), right.repartition(5))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "expected the native operator in the physical plan")
    assert(df.collect().map(_.toSeq).toSeq ===
      runNative(left.repartition(1), right.repartition(1)).collect().map(_.toSeq).toSeq)
  }

  test("native operator self-join from one relation resolves unambiguously") {
    val ev = (1L to 60L).map(i =>
      (i, s"u${i % 5}", i % 13, if (i % 2 == 0) "p" else "s")).toDF("id", "k", "lt", "side")
    val l = ev.filter(col("side") === "p").select("id", "k", "lt")
    val r = ev.filter(col("side") === "s")
      .select(col("k"), col("lt").as("rt"), col("id").cast("string").as("rv"))
    assert(runNative(l, r).collect().map(_.toSeq).toSeq ===
      run(l, r).collect().map(_.toSeq).toSeq)
  }
}
