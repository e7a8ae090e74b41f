package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. bucketed tables, or a build side too
  * large to broadcast but with a handful of hot keys).
  *
  * The fact side gets a DETERMINISTIC salt in [0, saltFactor); the
  * dimension side is replicated saltFactor times. The join key becomes
  * (key, salt), which fans each hot key out over saltFactor reducers.
  *
  * Why not `rand(seed)`: a per-row random salt depends on the row's
  * position within its partition, and after an upstream shuffle that
  * position is not stable across task retries — a partial stage recompute
  * could re-salt some rows differently and silently duplicate/drop join
  * output (the SPARK-23207 failure class). The salt therefore hashes row
  * CONTENT: `discriminators` (ideally a unique id column) when given,
  * else the whole row. The one degenerate case — byte-identical hot rows,
  * which all land on one reducer — is exactly when a caller should pass a
  * unique discriminator column. Salt values only affect placement, never
  * the result set (equality with the plain join is pinned in
  * SkewJoinSpec).
  */
object SkewJoin {

  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner",
      discriminators: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0)
    // Replicating the small side makes unmatched SMALL-side rows appear
    // saltFactor times — only join types that never emit them are sound.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase), s"unsupported salted join type: $joinType")
    val saltCol = "_graft_salt"
    val saltSource =
      (if (discriminators.nonEmpty) discriminators else skewed.columns.toSeq).map(col)
    val salted = skewed.withColumn(saltCol,
      pmod(xxhash64(saltSource: _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
