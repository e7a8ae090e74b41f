package graft.streaming

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Click(user: Long, page: String)

class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_snapstream_$tag")
      .toString + "/t"

  test("each micro-batch is one version; content converges to the batch union") {
    implicit val sqlCtx = spark.sqlContext
    val tbl = fresh("ing")
    val stream = MemoryStream[Click]
    val q = SnapshotStream.ingest(stream.toDF(), tbl, statsCols = Seq("user"))
    try {
      stream.addData(Click(1, "a"), Click(2, "b"))
      q.processAllAvailable()
      stream.addData(Click(3, "c"))
      q.processAllAvailable()
      stream.addData(Click(4, "d"), Click(5, "e"))
      q.processAllAvailable()
      assert(Snapshots.versions(spark, tbl) === Seq(1, 2, 3))
      // full content = union of all batches
      val got = Snapshots.read(spark, tbl)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
      // time travel to a batch boundary
      assert(Snapshots.read(spark, tbl, Some(1)).count() === 2)
      // inter-batch delta reads exactly batch 2's rows
      val delta = Snapshots.diffAdded(spark, tbl, 1, 2)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(delta === Set((3L, "c")))
      // stats recorded for skip-scans over the streamed table
      assert(Snapshots.manifest(spark, tbl, 3)
        .forall(_.stats.contains("user")))
    } finally q.stop()
  }

  test("replayed batch id commits nothing (exactly-once via manifest marker)") {
    val tbl = fresh("replay")
    val b0 = Seq(Click(1, "a")).toDF()
    val b1 = Seq(Click(2, "b")).toDF()
    SnapshotStream.commitBatch(b0, 0, tbl, Seq.empty)
    SnapshotStream.commitBatch(b1, 1, tbl, Seq.empty)
    // at-least-once replay of both ids: no new versions, no double rows
    SnapshotStream.commitBatch(b0, 0, tbl, Seq.empty)
    SnapshotStream.commitBatch(b1, 1, tbl, Seq.empty)
    assert(Snapshots.versions(spark, tbl) === Seq(1, 2))
    assert(Snapshots.read(spark, tbl).count() === 2)
    assert(Snapshots.properties(spark, tbl, 2)(SnapshotStream.batchProp) === "1")
    // an empty batch advances nothing
    SnapshotStream.commitBatch(b0.limit(0), 2, tbl, Seq.empty)
    assert(Snapshots.latestVersion(spark, tbl) === 2)
  }

  test("audited ingest drops a poison micro-batch and keeps flowing") {
    val tbl = fresh("wapstream")
    val audit: org.apache.spark.sql.DataFrame => Option[String] = b =>
      if (b.filter(col("page") === "BAD").count() > 0)
        Some("poison page") else None
    var rejected = Vector.empty[(Long, String)]
    val hook = (id: Long, why: String) => { rejected :+= (id, why); () }
    SnapshotStream.commitBatch(Seq(Click(1, "a")).toDF(), 0, tbl,
      Seq.empty, Some(audit), hook)
    SnapshotStream.commitBatch(Seq(Click(2, "BAD")).toDF(), 1, tbl,
      Seq.empty, Some(audit), hook)
    SnapshotStream.commitBatch(Seq(Click(3, "c")).toDF(), 2, tbl,
      Seq.empty, Some(audit), hook)
    // poison never published: two versions, no BAD row at any of them
    assert(Snapshots.versions(spark, tbl) === Seq(1, 2))
    val all = Snapshots.read(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all === Set((1L, "a"), (3L, "c")))
    assert(rejected === Vector((1L, "poison page")))
    // the marker is the last PUBLISHED id; replaying it is a no-op
    assert(Snapshots.properties(spark, tbl, 2)(SnapshotStream.batchProp)
      === "2")
    SnapshotStream.commitBatch(Seq(Click(3, "c")).toDF(), 2, tbl,
      Seq.empty, Some(audit), hook)
    assert(Snapshots.versions(spark, tbl) === Seq(1, 2))
  }

  test("streaming upsert converges to last-write-per-key, atomically") {
    implicit val sqlCtx = spark.sqlContext
    val tbl = fresh("ups")
    // seed the table (upsertMor needs a v1), then stream upserts at it
    Snapshots.commit(Seq(Click(1, "seed1"), Click(2, "seed2")).toDF(), tbl)
    val stream = MemoryStream[Click]
    val q = SnapshotStream.ingestUpsert(stream.toDF(), tbl, "user")
    try {
      stream.addData(Click(1, "a"), Click(3, "c"))
      q.processAllAvailable()
      stream.addData(Click(1, "a2"), Click(2, "b2"))
      q.processAllAvailable()
      val got = Snapshots.readMor(spark, tbl)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // user 1: overwritten twice; user 2: seed overwritten; user 3: new
      assert(got === Set((1L, "a2"), (2L, "b2"), (3L, "c")))
      // each micro-batch was ONE version (atomic tombstone+data)
      assert(Snapshots.versions(spark, tbl) === Seq(1, 2, 3))
      // time travel to the first upsert boundary
      assert(Snapshots.readMor(spark, tbl, Some(2))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
        Set((1L, "a"), (2L, "seed2"), (3L, "c")))
    } finally q.stop()
    // replayed batch id is a no-op (manifest marker discipline)
    SnapshotStream.upsertBatch(Seq(Click(9, "x")).toDF(), 0, tbl, "user",
      Seq.empty)
    assert(Snapshots.versions(spark, tbl) === Seq(1, 2, 3))
    // compaction materializes; plain readers serve the same content
    Snapshots.compactMor(spark, tbl)
    assert(Snapshots.read(spark, tbl)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a2"), (2L, "b2"), (3L, "c")))
  }
}
