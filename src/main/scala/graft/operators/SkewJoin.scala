package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't available (e.g. bucketed tables, or a build side too
  * large to broadcast but with a handful of hot keys).
  *
  * The fact side gets a seeded-random salt in [0, saltFactor); the
  * dimension side is replicated saltFactor times. The join key becomes
  * (key, salt), which fans each hot key out over saltFactor reducers. The
  * salt is `rand(seed)`, NOT a hash of the row: a hot key is typically hot
  * with byte-identical rows, and a row-hash salt would send every copy to
  * the same reducer — no fan-out exactly when it matters. Salt values only
  * affect physical placement, never the result set (equality with the
  * plain join is pinned in SkewJoinSpec), and the seed keeps task retries
  * self-consistent.
  */
object SkewJoin {

  def saltedJoin(
      skewed: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      joinType: String = "inner",
      seed: Long = 42L): DataFrame = {
    require(saltFactor > 0)
    // Replicating the small side makes unmatched SMALL-side rows appear
    // saltFactor times — only join types that never emit them are sound.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase), s"unsupported salted join type: $joinType")
    val saltCol = "_graft_salt"
    val salted = skewed.withColumn(saltCol,
      floor(rand(seed) * saltFactor).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ saltCol, joinType).drop(saltCol)
  }
}
