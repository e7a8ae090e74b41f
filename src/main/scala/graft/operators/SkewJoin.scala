package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. bucketed tables, or a build side too
  * large to broadcast but with a handful of hot keys).
  *
  * The fact side gets a deterministic salt in [0, saltFactor) derived by
  * hashing its whole row (so re-runs salt identically); the dimension side
  * is replicated saltFactor times. The join key becomes (key, salt), which
  * fans each hot key out over saltFactor reducers. Result equality with
  * the plain join is pinned in SkewJoinSpec.
  */
object SkewJoin {

  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // Replicating the small side makes unmatched SMALL-side rows appear
    // saltFactor times — only join types that never emit them are sound.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase), s"unsupported salted join type: $joinType")
    val saltCol = "_graft_salt"
    val salted = skewed.withColumn(saltCol,
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
