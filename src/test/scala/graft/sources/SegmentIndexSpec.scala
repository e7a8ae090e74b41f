package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The manifest-list tier: segment index build, segment-level pruning,
  * exactness vs the flat-manifest scan, and its crash/idempotence
  * discipline.
  */
class SegmentIndexSpec extends SparkSpec {

  private def freshTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_segix_$tag").toString + "/t"

  private def fs(table: String) =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 32 single-key files over key 0..31 with stats — every file a point
    * box, so segment envelopes are exact 4-key ranges.
    */
  private def buildKeyed(tbl: String): Unit = {
    import spark.implicits._
    val df = (0L until 32L).flatMap(k => Seq((k, k * 100), (k, k * 100 + 1)))
      .toDF("k", "v")
      .repartitionByRange(32, col("k")).sortWithinPartitions(col("k"))
    Snapshots.commit(df, tbl, statsCols = Seq("k", "v"))
  }

  test("segment pruning: box probe skips whole segments, result equals " +
      "the flat scan, counts add up") {
    val tbl = freshTable("box")
    buildKeyed(tbl)
    val nSegs = Snapshots.buildSegmentIndex(spark, tbl, segSize = 4)
    assert(nSegs === 8)
    val seg = Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 9L, 14L)))
    val flat = Snapshots.scanPrunedBox(spark, tbl, Seq(("k", 9L, 14L)))
    // keys 9..14 live in files 9..14 -> segments 2 (8-11) and 3 (12-15)
    assert(seg.segmentsRead === 2 && seg.segmentsSkipped === 6)
    assert(seg.filesRead === flat.filesRead)
    assert(seg.filesRead + seg.filesSkipped === 32)
    assert(seg.df.orderBy("k", "v").collect().toSeq ===
      flat.df.orderBy("k", "v").collect().toSeq)
  }

  test("build is idempotent and a prebuilt index serves without the " +
      "manifest") {
    val tbl = freshTable("idem")
    buildKeyed(tbl)
    assert(Snapshots.buildSegmentIndex(spark, tbl, segSize = 8) === 4)
    // second build: derivation of an immutable manifest — same count,
    // existing index untouched
    val ixPath = new Path(s"$tbl/_manifests/v000001.segments/index")
    val mtime = fs(tbl).getFileStatus(ixPath).getModificationTime
    assert(Snapshots.buildSegmentIndex(spark, tbl, segSize = 8) === 4)
    assert(fs(tbl).getFileStatus(ixPath).getModificationTime === mtime)
    // the segmented scan never opens the flat manifest: make it
    // unreadable and scan anyway (versions() still lists from the file
    // name, so resolve the version explicitly)
    val seg = Snapshots.scanPrunedBoxSegmented(spark, tbl,
      Seq(("k", 0L, 3L)), version = Some(1))
    assert(seg.segmentsRead === 1 && seg.segmentsSkipped === 3)
    assert(seg.df.count() === 8) // 4 keys x 2 rows
  }

  test("incremental build: an append reuses the parent's full segments " +
      "by reference and rolls only the tail; non-append lineage " +
      "rebuilds in full") {
    import spark.implicits._
    val tbl = freshTable("incr")
    buildKeyed(tbl)
    assert(Snapshots.buildSegmentIndex(spark, tbl, segSize = 4) === 8)
    // append 2 files -> the new index must be 8 reused + 1 tail segment
    Snapshots.commit(
      Seq((32L, 3200L), (33L, 3300L)).toDF("k", "v")
        .repartitionByRange(2, col("k")),
      tbl, statsCols = Seq("k", "v"))
    assert(Snapshots.buildSegmentIndex(spark, tbl, segSize = 4) === 9)
    val v2dir = new Path(s"$tbl/_manifests/v000002.segments")
    val written = fs(tbl).listStatus(v2dir).map(_.getPath.getName).sorted
    assert(written === Array("index", "seg-00008"),
      s"append must write only the tail segment, wrote ${written.toSeq}")
    // the reused segments serve scans exactly like a full rebuild would
    val seg = Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 9L, 14L)))
    assert(seg.segmentsRead === 2 && seg.segmentsSkipped === 7)
    assert(seg.filesRead + seg.filesSkipped === 34)
    assert(seg.df.count() === 12)
    val tail = Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 32L, 40L)))
    assert(tail.segmentsRead === 1 && tail.df.count() === 2)
    // compaction rewrites the layout: the prefix proof fails and the
    // index rebuilds in full under the new version's own dir
    val v3 = Snapshots.compactVersion(spark, tbl)
    assert(Snapshots.buildSegmentIndex(spark, tbl, segSize = 4) >= 1)
    val v3dir = new Path(f"$tbl/_manifests/v$v3%06d.segments")
    val v3Files = fs(tbl).listStatus(v3dir).map(_.getPath.getName)
    assert(v3Files.count(_.startsWith("seg-")) ===
      Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", Long.MinValue,
        Long.MaxValue))).segmentsRead,
      "full rebuild must own every segment it serves")
  }

  test("a stat-less file keeps its whole segment readable") {
    val tbl = freshTable("nostats")
    import spark.implicits._
    // v1: two files WITH stats, then append one file WITHOUT stats
    Snapshots.commit(Seq((1L, 1L)).toDF("k", "v"), tbl,
      statsCols = Seq("k"))
    Snapshots.commit(Seq((100L, 2L)).toDF("k", "v"), tbl) // no statsCols
    val n = Snapshots.buildSegmentIndex(spark, tbl, segSize = 4)
    assert(n === 1)
    // probe far away from both keys: the segment contains a stat-less
    // file, so its rolled envelope must NOT claim coverage of k
    val seg = Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 50L, 60L)))
    assert(seg.segmentsRead === 1, "stat-less member must keep the segment")
    assert(seg.df.count() === 0) // residual filter still exact
  }

  test("scan refuses a version without an index; half-written index " +
      "reads as absent") {
    val tbl = freshTable("crash")
    buildKeyed(tbl)
    val e = intercept[IllegalStateException] {
      Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 0L, 1L)))
    }
    assert(e.getMessage.contains("buildSegmentIndex"))
    // simulate a crashed builder: index present but terminator-less
    val dir = new Path(s"$tbl/_manifests/v000001.segments")
    fs(tbl).mkdirs(dir)
    val out = fs(tbl).create(new Path(dir, "index"), true)
    out.write("graft-manifest-v1\nseg-00000\t64\tk=0:31".getBytes("UTF-8"))
    out.close()
    intercept[IllegalStateException] {
      Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 0L, 1L)))
    }
    // a later complete build repairs it
    assert(Snapshots.buildSegmentIndex(spark, tbl, segSize = 16) === 2)
    assert(Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 0L, 1L)))
      .df.count() === 4)
  }

  test("segment blooms OR soundly: equality probe via index evidence") {
    val tbl = freshTable("bloom")
    import spark.implicits._
    val df = (0L until 16L).map(k => (k, s"u$k")).toDF("k", "u")
      .repartition(8, col("k"))
    Snapshots.commit(df, tbl, bloomCols = Seq("k"))
    Snapshots.buildSegmentIndex(spark, tbl, segSize = 4)
    val (fsys, root) = (fs(tbl), new Path(tbl))
    // read the index back through the public scan: a box on a column
    // with no range stats keeps everything (blooms are rolled, ranges
    // absent), and the result is still exact
    val seg = Snapshots.scanPrunedBoxSegmented(spark, tbl, Seq(("k", 3L, 3L)))
    assert(seg.df.count() === 1)
    assert(seg.segmentsRead + seg.segmentsSkipped === 2)
  }

  test("readIndexed PLANS from the segment tier when an index exists: " +
      "pruned segments' file entries are never parsed (probe-counted), " +
      "sizeInBytes answers from the header, results stay exact") {
    val tbl = freshTable("fidx")
    buildKeyed(tbl) // 32 single-key files
    Snapshots.buildSegmentIndex(spark, tbl, segSize = 4) // 8 segments
    val (df, ix) = Snapshots.readIndexed(spark, tbl)
    // size answered from the recorded per-segment byte totals — zero
    // segment parses, zero per-file stats
    val want = Snapshots.manifest(spark, tbl, 1).map(e =>
      fs(tbl).getFileStatus(new Path(s"$tbl/${e.path}")).getLen).sum
    assert(ix.sizeInBytes === want)
    assert(ix.segmentParses.get === 0,
      "sizeInBytes must not open segment files")
    // a selective filter prunes SEGMENTS first; only survivors parse
    val got = df.filter(col("k").between(9L, 14L))
      .orderBy("k", "v").collect().toSeq
    assert(ix.lastSegPrune === ((2, 8)), s"got ${ix.lastSegPrune}")
    assert(ix.segmentParses.get === 2,
      s"only surviving segments may parse, parsed ${ix.segmentParses.get}")
    assert(ix.lastPrune === ((6, 32)), s"got ${ix.lastPrune}")
    val flat = Snapshots.read(spark, tbl)
      .filter(col("k").between(9L, 14L)).orderBy("k", "v").collect().toSeq
    assert(got === flat)
    // a full scan parses each remaining segment exactly once (cached)
    assert(df.count() === 64L)
    assert(ix.segmentParses.get === 8)
    assert(df.count() === 64L)
    assert(ix.segmentParses.get === 8, "segment parses must be cached")
    // a masked version records its mask count in the header — the
    // planner refuses it back to readMor instead of mis-reading
    import spark.implicits._
    Snapshots.deleteWhere(spark, tbl, Seq(3L).toDF("k"), "k")
    Snapshots.buildSegmentIndex(spark, tbl, segSize = 4)
    val e = intercept[IllegalArgumentException](
      Snapshots.readIndexed(spark, tbl))
    assert(e.getMessage.contains("merge-on-read deletes"))
  }
}
