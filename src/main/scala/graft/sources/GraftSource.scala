package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, PrunedFilteredScan, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** `format("graft")` — the [[Snapshots]] table format surfaced through
  * Spark's OWN reader/writer/stream APIs, so a user needs no graft
  * import to consume versioned tables:
  *
  *  - `spark.read.format("graft").load(path)` reads the latest version
  *    through [[SnapshotFileIndex]], so every downstream `.filter`
  *    data-skips from manifest evidence automatically. Time travel via
  *    options: `versionAsOf` (version number), `timestampAsOf` (epoch
  *    millis, resolved like [[Snapshots.readAsOf]]), `tag` (a
  *    [[Branches]] tag name), `branch` (reads a live branch's head);
  *    at most one may be set.
  *  - `df.write.format("graft").mode(...).save(path)` commits through
  *    the snapshot protocol: Append/Overwrite map to the two commit
  *    shapes, ErrorIfExists refuses a non-empty table, Ignore is a
  *    no-op on one. `statsCols`/`bloomCols`/`strStatsCols`
  *    (comma-separated) record file-skipping evidence.
  *  - `df.writeStream.format("graft")` appends each micro-batch as one
  *    atomic commit with [[graft.streaming.SnapshotStream]]'s replay
  *    marker — exactly-once ingest where the stream's history IS the
  *    version history. Append output mode only.
  *
  * Registered as `graft` via META-INF/services, so the short name works
  * anywhere Spark accepts a format string.
  */
final class GraftSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source: a table path is required — .load(path) / .save(path)"))

  private def cols(parameters: Map[String, String], key: String): Seq[String] =
    parameters.get(key).toSeq.flatMap(_.split(",")).map(_.trim)
      .filter(_.nonEmpty)

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val branch = parameters.get("branch")
    val table = branch match {
      case Some(b) => Branches.branchPath(spark, pathOf(parameters), b)
      case None => pathOf(parameters)
    }
    val travel = Seq("versionAsOf", "timestampAsOf", "tag", "branch")
      .filter(parameters.contains)
    require(travel.size <= 1,
      s"graft source: set at most one of versionAsOf/timestampAsOf/tag/" +
        s"branch, got ${travel.mkString(", ")}")
    val version = parameters.get("versionAsOf").map(_.toInt)
      .orElse(parameters.get("tag").map(t =>
        Branches.tagVersion(spark, table, t)))
      .orElse(parameters.get("timestampAsOf").map { ts =>
        val t = ts.toLong
        val vs = Snapshots.versions(spark, table)
        val eligible = vs.filter(v =>
          Snapshots.properties(spark, table, v)
            .get(Snapshots.CommitTsProp).forall(_.toLong <= t))
        require(eligible.nonEmpty,
          s"graft source: no version of $table at or before $t")
        eligible.max
      })
      .getOrElse(Snapshots.latestVersion(spark, table))
    // route by the EXPLICIT table state, not exception control flow
    // (a malformed-manifest require must surface as itself, never as a
    // confusing later MOR-path error):
    //  - a segment-plannable version (header proves mask- and
    //    era-freedom) → the flat fast path WITHOUT opening the flat
    //    manifest at all (the segment tier's whole point);
    //  - merge-on-read masks → the MOR relation (v1 scan over readMor;
    //    metadata alone cannot subtract deletes);
    //  - rename/widen/default eras with surviving pre-boundary files →
    //    the EVOLVED relation (per-era FileIndex union — Catalyst data
    //    skipping survives schema evolution);
    //  - everything else → the flat data-skipping FileIndex fast path.
    // The reader options ride the relation either way so downstream
    // layers (SQL DML) can see whether this relation was time-traveled.
    def flat(pre: Option[Seq[Snapshots.FileEntry]]): BaseRelation = {
      // pass the already-parsed entries through: the routing decision
      // and the index constructor must not each pay an O(files) parse
      // (the refusal conditions were just checked by the router)
      val index = new SnapshotFileIndex(spark, table, version, pre, None,
        wholeVersion = true)
      HadoopFsRelation(index, new StructType(), index.dataSchema, None,
        new ParquetFileFormat, parameters)(spark)
    }
    if (Snapshots.segmentIndexFor(spark, table, version)
        .exists(SnapshotFileIndex.segmentPlannable)) flat(None)
    else {
      val entries = Snapshots.manifest(spark, table, version)
      val props = Snapshots.properties(spark, table, version)
      if (entries.exists(e => Snapshots.isMask(e.path)))
        new GraftMorRelation(sqlContext, table, version, parameters)
      else SnapshotFileIndex.refusalOf(table, version, entries, props) match {
        case None => flat(Some(entries))
        case Some(_) =>
          new GraftEvolvedRelation(sqlContext, table, version, parameters)
      }
    }
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = pathOf(parameters)
    val exists = Snapshots.versions(spark, table).nonEmpty
    def commit(overwrite: Boolean): Unit =
      Snapshots.commit(data, table, overwrite = overwrite,
        statsCols = cols(parameters, "statsCols"),
        bloomCols = cols(parameters, "bloomCols"),
        strStatsCols = cols(parameters, "strStatsCols"))
    mode match {
      case SaveMode.Append => commit(overwrite = false)
      case SaveMode.Overwrite => commit(overwrite = true)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft source: $table already has versions (SaveMode." +
            "ErrorIfExists)")
        commit(overwrite = false)
      case SaveMode.Ignore => if (!exists) commit(overwrite = false)
    }
    createRelation(sqlContext, parameters)
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val table = pathOf(parameters)
    val v = Snapshots.latestVersion(spark, table)
    require(v > 0, s"graft source: $table has no committed version to " +
      "stream from — commit a snapshot first")
    val recorded = Snapshots.properties(spark, table, v)
      .get(Snapshots.SchemaProp)
      .map(org.apache.spark.sql.types.DataType.fromJson(_)
        .asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"graft source: version $v of $table records no schema"))
    if (cdcMode(parameters)) {
      require(schema.isEmpty, "graft source: readChangeFeed streams the " +
        "table's RECORDED schema plus the change columns — a user schema " +
        "cannot apply")
      (shortName(), StructType(recorded.fields ++ Seq(
        StructField("_change_type", StringType, nullable = false),
        StructField("_commit_version", IntegerType, nullable = false))))
    } else (shortName(), schema.getOrElse(recorded))
  }

  private def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  /** `spark.readStream.format("graft")`: the table's VERSION HISTORY as
    * a stream — batch 1 is the snapshot as of stream start (or
    * `startingVersion`), every later trigger delivers exactly the rows
    * appended since the last processed version, read from only the
    * delta files ([[Snapshots.changes]] — cost follows the change, not
    * the table). Offsets are version numbers, so checkpointed restarts
    * resume exactly. Layout-only commits (`graft.data.change=false`
    * compaction/rebucket) advance the offset with no rows; commits that
    * DELETE rows (tombstones) refuse loudly — this is the append-only
    * tail, row-level deletes are [[Snapshots.changes]]' CDC surface.
    *
    * `option("readChangeFeed", "true")` switches the source to that CDC
    * surface AS A STREAM (Delta's streaming change-feed read): each
    * trigger delivers the committed versions' row-level change feed —
    * the table's columns plus `_change_type` ('insert' | 'delete') and
    * `_commit_version` — so delete-bearing commits (MOR tombstones,
    * position vectors, `upsertMor` = delete-of-old + insert-of-new)
    * STREAM instead of refusing, and a downstream consumer can maintain
    * state from a MUTATING 100 TB serving table incrementally (cost
    * follows the manifest delta: inserts read added files, delete
    * pre-images read only the parent files whose key envelope the
    * tombstone intersects). Offsets stay version numbers (exactly-once
    * across checkpointed restarts); layout-only commits advance
    * silently. Feed-underivable commits keep [[Snapshots.changes]]'
    * loud refusals: a copy-on-write rewrite doesn't say which rows
    * changed, and a schema-evolution commit changes the shape mid-
    * stream — restart the stream from the boundary with the new schema
    * (`startingVersion`).
    */
  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val table = pathOf(parameters)
    val cdc = cdcMode(parameters)
    val startingVersion = parameters.get("startingVersion").map(_.toInt)
      .getOrElse(0)
    val srcSchema = sourceSchema(sqlContext, schema, providerName,
      parameters)._2
    new Source {
      private def versionOf(
          o: org.apache.spark.sql.execution.streaming.Offset): Int =
        o match {
          case l: LongOffset => l.offset.toInt
          case other => other.json.trim.toInt // SerializedOffset replay
        }

      override def schema: StructType = srcSchema

      override def getOffset
          : Option[org.apache.spark.sql.execution.streaming.Offset] =
        Snapshots.versions(spark, table).lastOption.map(v =>
          LongOffset(v.toLong))

      override def getBatch(
          start: Option[org.apache.spark.sql.execution.streaming.Offset],
          end: org.apache.spark.sql.execution.streaming.Offset)
          : org.apache.spark.sql.DataFrame = {
        val from = start.map(versionOf).getOrElse(startingVersion)
        val to = versionOf(end)
        def wrap(df: org.apache.spark.sql.DataFrame) =
          org.apache.spark.sql.GraftBridge.internalDataFrame(spark,
            df.queryExecution.toRdd, df.schema, isStreaming = true)
        if (to <= from)
          return org.apache.spark.sql.GraftBridge.internalDataFrame(
            spark, spark.sparkContext
              .emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
            srcSchema, isStreaming = true)
        // append-only contract (default mode): a version that ADDS
        // tombstones deletes rows — not expressible as an insert
        // stream; refuse loudly (data.change=false layout commits are
        // fine, changes() skips them). readChangeFeed mode DELIVERS
        // those deletes as typed change rows instead.
        if (!cdc) {
          val vs = Snapshots.versions(spark, table)
            .filter(v => v > from && v <= to)
          vs.foreach { v =>
            if (!Snapshots.properties(spark, table, v)
                .get(Snapshots.DataChangeProp).contains("false")) {
              val parent = Snapshots.versions(spark, table).filter(_ < v)
                .lastOption
              val parentPaths = parent
                .map(p => Snapshots.manifest(spark, table, p)
                  .map(_.path).toSet)
                .getOrElse(Set.empty[String])
              val tomb = Snapshots.manifest(spark, table, v)
                .filterNot(e => parentPaths(e.path))
                .filter(e => Snapshots.isMask(e.path))
              require(tomb.isEmpty, s"graft source: version $v of $table " +
                "deletes rows (tombstones or position vectors) — the " +
                "streaming tail is append-only; consume row-level " +
                "deletes as a stream via option(\"readChangeFeed\", " +
                "\"true\"), or in batch via Snapshots.changes")
            }
          }
        }
        val raw = Snapshots.changes(spark, table, from, to)
        val feed =
          if (cdc) raw.select(srcSchema.fieldNames.map(
            org.apache.spark.sql.functions.col).toIndexedSeq: _*)
          else raw.drop("_change_type", "_commit_version")
        wrap(feed)
      }

      override def stop(): Unit = ()
      override def toString: String = s"GraftStreamSource[$table]"
    }
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append() ||
      outputMode == OutputMode.Update(),
      s"graft sink: append or update output mode, got $outputMode")
    require(partitionColumns.isEmpty,
      "graft sink: partitioning rides the table layout (commitBucketed/" +
        "rebucket), not partitionBy")
    val table = pathOf(parameters)
    val statsCols = cols(parameters, "statsCols")
    // UPDATE mode: every micro-batch is one atomic merge-on-read upsert.
    // On a partition-spec'd table the upsert files carry no layout —
    // partition listings refuse until the next compactMor, which
    // restores the declared layout (compaction routes through the
    // partitioned writer).
    // keyed on the required `keyCol` option — a stateful aggregation's
    // changed rows REPLACE their keys' previous values, giving a serving
    // table that always reads as the latest state per key (exactly-once
    // via the same replay marker as append)
    val keyCol = parameters.get("keyCol")
    require(outputMode == OutputMode.Append() || keyCol.nonEmpty,
      "graft sink: update output mode needs .option(\"keyCol\", ...) — " +
        "the upsert key")
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // the incoming frame is bound to the streaming (incremental)
        // plan — re-wrap its materialized rows as a standalone batch
        // frame before handing it to the commit path
        val batch = org.apache.spark.sql.GraftBridge.internalDataFrame(
          data.sparkSession, data.queryExecution.toRdd, data.schema)
        if (outputMode == OutputMode.Update()) {
          // the table's FIRST batch has nothing to upsert against —
          // seed it as a plain marked commit
          if (Snapshots.latestVersion(data.sparkSession, table) == 0)
            graft.streaming.SnapshotStream.commitBatch(batch, batchId,
              table, statsCols)
          else
            graft.streaming.SnapshotStream.upsertBatch(batch, batchId,
              table, keyCol.get, statsCols)
        } else
          graft.streaming.SnapshotStream.commitBatch(batch, batchId, table,
            statsCols)
      }
      override def toString: String = s"GraftSink[$table]"
    }
  }
}

/** The catalog relation for versions carrying merge-on-read masks:
  * [[Snapshots.readMor]] behind Spark's v1 `PrunedFilteredScan` — column
  * pruning and the translatable pushed filters are applied INSIDE the
  * MOR plan (before the mask anti-joins), and Spark re-applies every
  * filter on top (v1 contract), so results are exact even for filters
  * the translator skips. Slower than the data-skipping FileIndex path
  * by design; `compactMor` returns the table to the fast path.
  */
final class GraftMorRelation(sql: SQLContext, val table: String,
    val version: Int, val options: Map[String, String])
    extends BaseRelation with PrunedFilteredScan {
  import org.apache.spark.sql.{Column, Row}
  import org.apache.spark.sql.functions.col

  override def sqlContext: SQLContext = sql

  private def frame: DataFrame =
    Snapshots.readMor(sql.sparkSession, table, Some(version))

  // the RECORDED schema, not the MOR plan's (whose nullability widens
  // through the mask joins) — it must equal what the FileIndex relation
  // reported when the catalog table was created, or re-resolution after
  // a DELETE refuses with a schema-mismatch error
  override val schema: StructType =
    Snapshots.properties(sql.sparkSession, table, version)
      .get(Snapshots.SchemaProp)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
      .getOrElse(frame.schema) match {
        // match the FileIndex relation's nullability convention exactly
        case st => StructType(st.fields.map(_.copy(nullable = true)))
      }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[Row] = {
    val filtered = filters.flatMap(GraftV1Filters.translate)
      .foldLeft(frame)((df, c) => df.filter(c))
    filtered.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}

/** v1 `Filter` → [[Column]] translation shared by the MOR and evolved
  * relations — the pushed filters re-enter a full Catalyst plan, where
  * they drive file skipping (evolved: per-era FileIndex envelopes) or
  * scan-level pushdown (MOR: parquet row groups before the mask joins).
  */
private[sources] object GraftV1Filters {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.col

  def translate(f: org.apache.spark.sql.sources.Filter): Option[Column] = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => Some(col(a) === v)
      case GreaterThan(a, v) => Some(col(a) > v)
      case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
      case LessThan(a, v) => Some(col(a) < v)
      case LessThanOrEqual(a, v) => Some(col(a) <= v)
      case In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, p) => Some(col(a).startsWith(p))
      // STRICT And: weakening to one side would be unsound under a
      // surrounding Not (the weakened predicate negates to something
      // STRONGER, dropping rows the v1 contract cannot re-add) —
      // untranslated shapes just stay with Spark's re-applied filter
      case And(l, r) => for { a <- translate(l); b <- translate(r) }
        yield a && b
      case Or(l, r) => for { a <- translate(l); b <- translate(r) }
        yield a || b
      case Not(c) => translate(c).map(!_)
      case _ => None
    }
  }
}

/** The catalog relation for ERA-EVOLVED versions (rename / type-widen /
  * add-column-default events with surviving pre-boundary files):
  * [[Snapshots.readIndexedEvolved]] behind Spark's v1
  * `PrunedFilteredScan`. Pushed filters re-apply INSIDE the evolved
  * plan, where Catalyst pushes them through each era's re-aliasing
  * projection into that era's [[SnapshotFileIndex]] — so a plain SQL
  * `WHERE` still cuts files from manifest evidence on a renamed/widened
  * 100 TB table (the numFiles cut is visible in the inner scans).
  * Spark re-applies every filter on top (v1 contract), so results stay
  * exact for shapes the translator skips. `compactMor`/compaction
  * returns the table to the flat single-index fast path.
  */
final class GraftEvolvedRelation(sql: SQLContext, val table: String,
    val version: Int, val options: Map[String, String])
    extends BaseRelation with PrunedFilteredScan {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.functions.col

  override def sqlContext: SQLContext = sql

  // memoized: the relation is pinned to an immutable version, and the
  // evolved plan is expensive to build (manifest parse, era grouping,
  // one SnapshotFileIndex per era with its file-status cache) — a def
  // here repaid the full planning cost on EVERY buildScan against the
  // catalog relation
  private lazy val frame: DataFrame =
    Snapshots.readIndexedEvolved(sql.sparkSession, table, Some(version))._1

  // the RECORDED schema, nullable-normalized to the relation convention
  // (see GraftMorRelation.schema for why); no frame-schema fallback —
  // readIndexedEvolved itself refuses schema-less legacy manifests, so
  // falling back would build the whole per-era plan just to throw from
  // inside it with a confusing stack
  override val schema: StructType =
    Snapshots.properties(sql.sparkSession, table, version)
      .get(Snapshots.SchemaProp)
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(
        s"GraftEvolvedRelation: version $version of $table records no " +
          "schema (legacy manifest) — recommit or use Snapshots.read"))
      match {
        case st => StructType(st.fields.map(_.copy(nullable = true)))
      }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[Row] = {
    val filtered = filters.flatMap(GraftV1Filters.translate)
      .foldLeft(frame)((df, c) => df.filter(c))
    filtered.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}
