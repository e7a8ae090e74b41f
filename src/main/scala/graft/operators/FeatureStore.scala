package graft.operators

import org.apache.spark.sql.DataFrame

/** Feature-store point-in-time (PIT) join: assemble a training set by
  * attaching to each spine row (entity, label timestamp) the LATEST
  * value of each feature table at or before that timestamp — the
  * leakage-free feature assembly every supervised pipeline needs (a
  * feature computed after the label's timestamp is information from the
  * future; models trained on it look great offline and fail online).
  *
  * Built by folding [[AsOfJoin.backward]] over the feature tables: each
  * feature join is ONE key-shuffle union+window (no range cross
  * product), so assembling F feature tables costs F bounded shuffles of
  * spine+feature — at 100 TB the spine re-shuffles per feature, which
  * is the standard trade (Point-in-Time joins in Feast/Tecton do the
  * same); co-bucketing spine and features on the entity key removes
  * even that (see [[graft.sources.Snapshots.commitBucketed]]).
  *
  * Each feature table must be deduplicated per (key, time) first so
  * "latest at ts" is a total order — same contract as every as-of
  * consumer (q_asof_join's max-event_id rule).
  */
object FeatureStore {

  /** One feature source: `payload` columns are attached as
    * `prefix + name`; rows with no feature at or before the spine time
    * keep them null.
    */
  final case class FeatureTable(df: DataFrame, keyCols: Seq[String],
      timeCol: String, payload: Seq[String], prefix: String = "")

  /** PIT-join `features` onto `spine` (whose label time is
    * `spineTime`). Feature order does not affect the result — each join
    * only appends its own prefixed payload columns.
    */
  def pointInTime(spine: DataFrame, spineTime: String,
      features: Seq[FeatureTable]): DataFrame = {
    require(features.nonEmpty, "pointInTime needs at least one feature")
    val dup = features.flatMap(f => f.payload.map(f.prefix + _))
      .groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    require(dup.isEmpty,
      s"feature payload names collide after prefixing: ${dup.mkString(",")}")
    features.foldLeft(spine)((acc, f) =>
      AsOfJoin.backward(acc, f.df, f.keyCols, spineTime, f.timeCol,
        f.payload, f.prefix))
  }
}
