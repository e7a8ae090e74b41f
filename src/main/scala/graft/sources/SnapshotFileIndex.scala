package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CATALYST-NATIVE data skipping for [[Snapshots]] tables: a
  * [[FileIndex]] over the version's manifest, so the ordinary Spark scan
  * path — not a bespoke `scanPruned*` call — decides which files to read.
  * `FileSourceStrategy` pushes the query's data filters into
  * [[listFiles]], where each file's manifest evidence ([min,max]
  * envelopes, UTF-8 string envelopes, bloom filters) proves files
  * row-free and drops them BEFORE the scan is planned. The win over the
  * explicit `scanPrunedBox` API: every `.filter`/`WHERE` on a
  * [[Snapshots.readIndexed]] frame prunes automatically, composed
  * filters (`AND`/`OR`/`IN`/`BETWEEN`/prefix) prune too, and the file
  * cut shows up in the scan's own `numFiles` metric — at 100 TB the
  * planner reads manifest evidence (KBs) instead of footers (TBs).
  *
  * Soundness rule: a file is dropped only when the evidence PROVES no
  * row can match (`mayMatch` returns false); any unrecognized predicate
  * shape, stat-less column, or non-literal comparison keeps the file.
  * Listing is driver-side manifest parsing plus one `getFileStatus` per
  * file at construction (cached — re-listing per query would be the
  * planning bottleneck the manifest exists to avoid).
  *
  * Refused loudly: tombstoned versions (a tombstone read as data
  * null-fills the schema — use [[Snapshots.readMor]]) and tables with
  * rename/drop events (era-mapped reads need [[Snapshots.read]]'s
  * per-file aliasing, which a flat relation cannot express).
  */
final class SnapshotFileIndex(spark: SparkSession, val table: String,
    val version: Int) extends FileIndex {

  /** The version's manifest entries — the evidence surface optimizer
    * rules ([[graft.plans.MetaAggRule]]) compute from.
    */
  private[graft] val entries: Seq[Snapshots.FileEntry] = {
    val es = Snapshots.manifest(spark, table, version)
    require(!es.exists(e => Snapshots.isMask(e.path)),
      s"SnapshotFileIndex: version $version of $table carries merge-on-" +
        "read deletes — use Snapshots.readMor (or compactMor first)")
    es
  }

  private val props = Snapshots.properties(spark, table, version)
  // era refusals are PRECISE, not blanket: evolution events are
  // inherited forever, but once compaction rewrites every pre-event
  // file (no entry's seq is at or below a boundary) the events are
  // inert and the flat fast path is exact again
  private def anyPreEventFile(boundaries: Seq[Int]): Boolean =
    boundaries.exists(b => entries.exists(_.seq <= b))
  require(!anyPreEventFile(
      (Snapshots.renameEvents(props) ++ Snapshots.dropEvents(props))
        .map(_.boundary)),
    s"SnapshotFileIndex: $table has files from before a rename/drop — " +
      "era-mapped reads need Snapshots.read (or compact to materialize)")
  require(!anyPreEventFile(Snapshots.defaultEvents(props).map(_.boundary)),
    s"SnapshotFileIndex: $table has files from before an add-column " +
      "default — a flat relation would read them as NULL; use " +
      "Snapshots.read (or compact to materialize)")
  // precise, not blanket: only files that PREDATE a widen boundary
  // store the narrow physical type; once compaction rewrites them the
  // (inherited) event is inert and the flat index works again
  require(!Snapshots.widenEvents(props)
      .exists(w => entries.exists(e => e.seq <= w.boundary)),
    s"SnapshotFileIndex: $table has files narrower than a type " +
      "widening — use Snapshots.read (or compact to materialize)")

  /** The version's recorded schema — the committing writer's truth;
    * footer inference would silently widen types. NULLABILITY is
    * normalized to nullable, Spark's own file-table convention: file
    * scans always produce nullable output, and a copy-on-write merge
    * re-records its scan's schema — a catalog table pinned to a NOT
    * NULL creation-time schema would refuse to re-resolve after the
    * first merge flipped it.
    */
  val dataSchema: StructType = props.get(Snapshots.SchemaProp) match {
    case Some(json) =>
      val st = DataType.fromJson(json).asInstanceOf[StructType]
      StructType(st.fields.map(_.copy(nullable = true)))
    case None => throw new IllegalStateException(
      s"SnapshotFileIndex: version $version of $table records no schema " +
        "(legacy manifest) — recommit or use Snapshots.read")
  }

  private val rootPath = {
    val p = new Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p)
  }

  private val statuses: Seq[(Snapshots.FileEntry, FileStatus)] = {
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    entries.map { e =>
      val p = if (new Path(e.path).isAbsolute) new Path(e.path)
        else new Path(rootPath, e.path)
      (e, fs.getFileStatus(p))
    }
  }

  /** (files kept, files total) of the most recent [[listFiles]] — the
    * observable skip counter specs and operators report on.
    */
  @volatile var lastPrune: (Int, Int) = (entries.size, entries.size)

  /** Table root FIRST (rules key on it), then the data dir. The
    * two-path shape is deliberate: Spark's `INSERT INTO` planning for
    * file relations (`InsertIntoHadoopFsRelationCommand`) requires
    * exactly one root path, so a catalog/SQL insert against this
    * relation fails loudly instead of silently writing parquet files
    * no manifest references — commits must go through the snapshot
    * protocol. Reads are unaffected (scans list through [[listFiles]]).
    */
  override def rootPaths: Seq[Path] = Seq(rootPath, new Path(rootPath, "data"))

  override def partitionSchema: StructType = new StructType()

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = statuses.filter { case (e, _) =>
      dataFilters.forall(f => mayMatch(e, f))
    }
    lastPrune = (kept.size, statuses.size)
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map { case (_, st) => FileStatusWithMetadata(st, Map.empty) }))
  }

  // ---- evidence evaluation -------------------------------------------

  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  private def strOf(v: Any): Option[String] = v match {
    case u: UTF8String => Some(u.toString)
    case s: String => Some(s)
    case _ => None
  }

  /** May `e` contain a row matching a single literal comparison on
    * `name`? Uses the integral envelope, the string envelope, and (for
    * equality) the bloom filter; a column with no recorded evidence
    * keeps the file.
    */
  private def cmpMay(e: Snapshots.FileEntry, name: String, v: Any,
      op: String): Boolean = {
    val long = longOf(v)
    val str = strOf(v)
    val envOk: Boolean = (long, str) match {
      case (Some(l), _) => e.stats.get(name).forall { case (mn, mx) =>
        op match {
          case "eq" => mn <= l && l <= mx
          case "gt" => mx > l
          case "ge" => mx >= l
          case "lt" => mn < l
          case "le" => mn <= l
        }
      }
      case (_, Some(s)) => e.strStats.get(name).forall { case (mn, mx) =>
        op match {
          case "eq" => !ParquetMeta.u8Less(s, mn) && !ParquetMeta.u8Less(mx, s)
          case "gt" => ParquetMeta.u8Less(s, mx)
          case "ge" => !ParquetMeta.u8Less(mx, s)
          case "lt" => ParquetMeta.u8Less(mn, s)
          case "le" => !ParquetMeta.u8Less(s, mn)
        }
      }
      case _ => true // unsupported literal type: no evidence, keep
    }
    val bloomOk: Boolean = op != "eq" || (e.blooms.get(name) match {
      case Some(bits) =>
        val jvm = v match { case u: UTF8String => u.toString; case x => x }
        Snapshots.bloomMightContain(bits, jvm)
      case None => true
    })
    envOk && bloomOk
  }

  /** Prefix match: values with prefix `p` lie in [p, successor(p)), so
    * the file may match iff its string envelope intersects that range.
    * No successor exists when the prefix is all 0xFF bytes — keep.
    */
  private def prefixMay(e: Snapshots.FileEntry, name: String, p: String)
      : Boolean =
    e.strStats.get(name).forall { case (mn, mx) =>
      val bytes = p.getBytes("UTF-8")
      val i = bytes.lastIndexWhere(b => (b & 0xff) != 0xff)
      val succ =
        if (i < 0) None
        else {
          val s = bytes.take(i + 1)
          s(i) = (s(i) + 1).toByte
          Some(new String(s, java.nio.charset.StandardCharsets.ISO_8859_1))
        }
      // mx >= p  AND  mn < successor(p)  (successor compared bytewise;
      // ISO_8859_1 keeps raw bytes so u8Less sees the incremented byte)
      !ParquetMeta.u8Less(mx, p) && succ.forall(su => u8LessRaw(mn, su))
    }

  // u8Less over the ISO_8859_1-roundtripped successor: compare the raw
  // byte sequences, not UTF-8 re-encodings (the successor may not be
  // valid UTF-8)
  private def u8LessRaw(utf8Val: String, isoSucc: String): Boolean = {
    val a = utf8Val.getBytes("UTF-8")
    val b = isoSucc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** Conservative three-valued pruning: false ONLY when the manifest
    * evidence proves no row of the file can satisfy `expr`.
    */
  private def mayMatch(e: Snapshots.FileEntry, expr: Expression): Boolean =
    expr match {
      case And(l, r) => mayMatch(e, l) && mayMatch(e, r)
      case Or(l, r) => mayMatch(e, l) || mayMatch(e, r)
      case EqualTo(a: AttributeReference, Literal(v, _)) => cmpMay(e, a.name, v, "eq")
      case EqualTo(Literal(v, _), a: AttributeReference) => cmpMay(e, a.name, v, "eq")
      case GreaterThan(a: AttributeReference, Literal(v, _)) => cmpMay(e, a.name, v, "gt")
      case GreaterThan(Literal(v, _), a: AttributeReference) => cmpMay(e, a.name, v, "lt")
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMay(e, a.name, v, "ge")
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMay(e, a.name, v, "le")
      case LessThan(a: AttributeReference, Literal(v, _)) => cmpMay(e, a.name, v, "lt")
      case LessThan(Literal(v, _), a: AttributeReference) => cmpMay(e, a.name, v, "gt")
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => cmpMay(e, a.name, v, "le")
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => cmpMay(e, a.name, v, "ge")
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.collect { case Literal(v, _) => v }
          .exists(v => cmpMay(e, a.name, v, "eq"))
      case InSet(a: AttributeReference, hset) =>
        hset.exists(v => cmpMay(e, a.name, v, "eq"))
      case StartsWith(a: AttributeReference, Literal(v, StringType)) =>
        strOf(v).forall(p => prefixMay(e, a.name, p))
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null =>
        cmpMay(e, a.name, v, "eq")
      case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null =>
        cmpMay(e, a.name, v, "eq")
      case _ => true // IsNotNull, casts, UDFs, non-literal sides: keep
    }
}
