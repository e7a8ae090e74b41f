package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** UNIQUE key constraints ([[Snapshots.addUnique]]): primary-key
  * enforcement with envelope-pruned collision checks.
  */
class UniqueSpec extends SparkSpec {

  private def freshTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_uq_$tag").toString + "/t"

  private def orders = spark.read.parquet(s"$sf001/orders.parquet")
    .select(col("o_orderkey"), col("o_totalprice"))
    .groupBy("o_orderkey")
    .agg(first(col("o_totalprice")).as("o_totalprice")) // distinct keys

  test("append collisions and in-batch duplicates are rejected") {
    val tbl = freshTable("basic")
    Snapshots.commit(orders.filter(col("o_orderkey") < 500), tbl,
      statsCols = Seq("o_orderkey"))
    Snapshots.addUnique(spark, tbl, "o_orderkey")
    // colliding append
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.commit(orders.filter(col("o_orderkey") < 10), tbl,
        statsCols = Seq("o_orderkey"))
    }
    assert(e1.getMessage.contains("already present"))
    // in-batch duplicate
    val dup = orders.filter(col("o_orderkey") === 900)
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.commit(dup.unionByName(dup), tbl,
        statsCols = Seq("o_orderkey"))
    }
    assert(e2.getMessage.contains("duplicate keys in the batch"))
    // disjoint append lands, constraint inherited
    Snapshots.commit(orders.filter(col("o_orderkey") >= 500 &&
      col("o_orderkey") < 600), tbl, statsCols = Seq("o_orderkey"))
    assert(Snapshots.uniqueKeys(spark, tbl) === Seq("o_orderkey"))
  }

  test("addUnique refuses a table that already duplicates the key") {
    val tbl = freshTable("dups")
    val d = orders.filter(col("o_orderkey") < 50)
    Snapshots.commit(d.unionByName(d), tbl)
    val e = intercept[IllegalArgumentException] {
      Snapshots.addUnique(spark, tbl, "o_orderkey")
    }
    assert(e.getMessage.contains("deduplicate first"))
  }

  test("delete frees the key for re-insert; upsert replaces freely") {
    val tbl = freshTable("redo")
    Snapshots.commit(orders.filter(col("o_orderkey") < 300), tbl,
      statsCols = Seq("o_orderkey"))
    Snapshots.addUnique(spark, tbl, "o_orderkey")
    // upsert of an existing key is its contract — allowed
    Snapshots.upsertMor(spark, tbl,
      orders.filter(col("o_orderkey") === 7)
        .withColumn("o_totalprice", lit(-1.0)), "o_orderkey")
    // but an upsert batch duplicating a key internally is not
    val dup = orders.filter(col("o_orderkey") === 8)
    intercept[IllegalArgumentException] {
      Snapshots.upsertMor(spark, tbl, dup.unionByName(dup), "o_orderkey")
    }
    // deleting a key makes a later plain append of it legal — the
    // collision check reads the MOR-visible rows, not raw files
    Snapshots.deleteWhere(spark, tbl,
      spark.range(20, 30).select(col("id").as("o_orderkey")), "o_orderkey")
    Snapshots.commit(orders.filter(col("o_orderkey").between(20, 29)), tbl,
      statsCols = Seq("o_orderkey"))
    assert(Snapshots.readMor(spark, tbl).count() === 300)
  }

  test("multiple NULL keys are allowed (SQL UNIQUE semantics)") {
    val tbl = freshTable("nulls")
    val base = orders.filter(col("o_orderkey") < 100)
    Snapshots.commit(base, tbl, statsCols = Seq("o_orderkey"))
    Snapshots.addUnique(spark, tbl, "o_orderkey")
    val nulls = base.limit(3)
      .withColumn("o_orderkey", lit(null).cast("long"))
    Snapshots.commit(nulls, tbl)
    Snapshots.commit(nulls, tbl)
    assert(Snapshots.readMor(spark, tbl)
      .filter(col("o_orderkey").isNull).count() === 6)
  }

  test("collision scan prunes parent files by the batch key envelope") {
    val tbl = freshTable("prune")
    Snapshots.commit(orders.repartitionByRange(4, col("o_orderkey")), tbl,
      statsCols = Seq("o_orderkey"))
    Snapshots.addUnique(spark, tbl, "o_orderkey")
    val nFiles = Snapshots.manifest(spark, tbl, 1)
      .count(e => !Snapshots.isTombstone(e.path))
    assert(nFiles >= 3)
    // a low-envelope batch of NEW keys: only low-key files are read.
    // Proxy assertion: the disjoint append succeeds (correctness) and a
    // colliding low-key batch still trips (the pruned set suffices).
    val shifted = orders.filter(col("o_orderkey") < 10)
      .withColumn("o_orderkey", col("o_orderkey") + 1000000)
    Snapshots.commit(shifted, tbl, statsCols = Seq("o_orderkey"))
    intercept[IllegalArgumentException] {
      Snapshots.commit(orders.filter(col("o_orderkey") < 5), tbl)
    }
  }
}
