package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application: collapse a change feed of tagged
  * insert/update/delete rows onto a snapshot — the MERGE a lakehouse table
  * runs every ingest cycle (the reference re-extracts full tables each run,
  * README "full refresh"; this is the operator that replaces that at
  * 100 TB, where re-reading the snapshot per cycle is the cost ceiling).
  */
object Cdc {

  /** Apply `changes` (`opCol` in I/U/D, one `versionCol` per change;
    * (key, version) pairs must be unique or the winner is undefined) to
    * `snapshot`: per key the highest-version change wins, a winning D
    * removes the key, unchanged keys pass through, I on a new key inserts.
    *
    * Scale shape: ONE aggregation over the change feed — `max_by` of the
    * payload struct keyed on the version, so partial (map-side)
    * aggregation collapses a key changed a million times to one row per
    * map task — then one shuffled full-outer hash join against the
    * snapshot. Deliberately no `row_number() over (key, version desc)`:
    * that shape sorts every change group and cannot partial-aggregate.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    val dataCols = snapshot.columns.filter(_ != keyCol).toSeq
    require(dataCols.nonEmpty, "snapshot needs at least one non-key column")
    val reserved = snapshot.columns
      .filter(c => c == "_op" || c.startsWith("_new_"))
    require(reserved.isEmpty,
      s"snapshot column names ${reserved.mkString(", ")} are reserved by applyChanges")
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max_by(struct((opCol +: dataCols).map(col): _*), col(versionCol))
        .as("_c"))
      .select(col(keyCol) +: col(s"_c.$opCol").as("_op") +:
        dataCols.map(c => col(s"_c.$c").as(s"_new_$c")): _*)
    snapshot.join(latest, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(keyCol) +: dataCols.map(c =>
        when(col("_op").isNotNull, col(s"_new_$c")).otherwise(col(c)).as(c)): _*)
  }
}
