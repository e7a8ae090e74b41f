package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (1L, "A", 10.0),
    (2L, "B", 20.0),
    (3L, "C", 30.0),
    (4L, "D", 40.0),
  ).toDF("k", "status", "amount")

  test("applyChanges: last version wins, deletes remove, inserts add, rest pass through") {
    val changes = Seq(
      // k=1: two updates, v2 wins
      (1L, "U", 1L, "A1", 11.0),
      (1L, "U", 2L, "A2", 12.0),
      // k=2: update then delete -> gone
      (2L, "U", 1L, "B1", 21.0),
      (2L, "D", 2L, "B", 20.0),
      // k=3: delete then re-insert -> reinserted payload survives
      (3L, "D", 1L, "C", 30.0),
      (3L, "I", 2L, "C9", 39.0),
      // k=5: insert on a key absent from the snapshot
      (5L, "I", 1L, "E", 50.0),
      // k=4: no changes
    ).toDF("k", "op", "version", "status", "amount")
    val got = Cdc.applyChanges(snapshot, changes, "k")
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, "A2", 12.0),
      (3L, "C9", 39.0),
      (4L, "D", 40.0),
      (5L, "E", 50.0)))
  }

  test("applyChanges result is independent of change-feed row order") {
    val changes = Seq(
      (1L, "U", 2L, "A2", 12.0),
      (2L, "D", 2L, "B", 20.0),
      (1L, "U", 1L, "A1", 11.0),
      (2L, "U", 1L, "B1", 21.0),
    ).toDF("k", "op", "version", "status", "amount")
    val a = Cdc.applyChanges(snapshot, changes, "k").orderBy("k").collect().toSeq
    val b = Cdc.applyChanges(snapshot, changes.repartition(7).sortWithinPartitions("version"), "k")
      .orderBy("k").collect().toSeq
    assert(a === b)
    assert(a.map(_.getLong(0)) === Seq(1L, 3L, 4L))
  }

  test("applyChanges plan aggregates the feed without a window sort") {
    val changes = Seq((1L, "U", 1L, "A1", 11.0)).toDF("k", "op", "version", "status", "amount")
    val plan = Cdc.applyChanges(snapshot, changes, "k")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"expected no window operator:\n$plan")
  }
}
