package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: pairwise support / confidence /
  * lift over a (basket, item) relation — the rule-mining pass run after
  * [[Graphs.kCoreSurvivors]]' density pre-filter, and the classic retail
  * "customers who bought X also bought Y".
  *
  * Scale shape (the standard a-priori first pass): items prune to the
  * frequency-qualified set BEFORE any pairing (the support threshold is
  * the scale bound — infrequent items can never form a frequent pair),
  * pair enumeration is a per-basket self-join whose fan-out is bounded
  * by the square of the basket size (bounded in any real order/session
  * corpus; the frequent-item prune caps it even when a degenerate basket
  * holds thousands of items), and everything downstream aggregates on
  * pair keys. No driver state, nothing all-pairs across the item
  * inventory — cost is O(Σ qualifiedBasketSize²) + pair-keyed shuffles.
  *
  * The state/serving split ([[basketState]] / [[rulesFromState]]) makes
  * the counts INCREMENTALLY MAINTAINABLE: item, pair, and basket counts
  * are all additive, so a delta batch of WHOLE baskets folds into stored
  * state via [[IncrementalAgg.mergeRollup]] and rules re-derive from
  * rollup-sized state — the fact history is never rescanned. (Whole
  * baskets per batch is the one soundness requirement: a basket split
  * across two batches would under-count its pairs.)
  *
  * Float parity: counts are exact integers; confidence and lift are one
  * correctly-rounded IEEE division each of exact-integer doubles
  * (products stay < 2^53) — bit-identical cross-engine — and round(6)
  * for output.
  */
object Baskets {

  /** The additive count state behind the rules: per-item basket counts
    * (UNPRUNED — serving thresholds must stay changeable after the
    * fact), unordered-pair co-occurrence counts, and the basket count.
    * `pruneItemCount` > 1 applies the a-priori prune to PAIR enumeration
    * only (the one-shot batch optimization); state meant for incremental
    * merging should keep it at 1 so a later-frequent item's pair history
    * is not lost. All three frames are additive across disjoint
    * whole-basket batches.
    */
  def basketState(items: DataFrame, basketCol: String, itemCol: String,
      pruneItemCount: Int = 1): (DataFrame, DataFrame, DataFrame) = {
    require(pruneItemCount >= 1, s"pruneItemCount >= 1, got $pruneItemCount")
    val b = items.select(col(basketCol).cast("long").as("basket"),
        col(itemCol).cast("long").as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val itemCounts = b.groupBy(col("item")).agg(count(lit(1)).as("c_item"))
    val qualified =
      if (pruneItemCount <= 1) b
      else b.join(itemCounts.filter(col("c_item") >= pruneItemCount)
        .select(col("item")), "item")
    val pairCounts = qualified.select(col("basket"), col("item").as("ia"))
      .join(qualified.select(col("basket"), col("item").as("ib")), "basket")
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_both"))
    val basketCount = b.agg(count_distinct(col("basket")).as("n_baskets"))
    (itemCounts, pairCounts, basketCount)
  }

  /** Top-`topK` directed rules derived from (stored or fresh) count
    * state, ranked by co-occurrence count (ties: antecedent, consequent
    * — a total integer order, so the cut is deterministic). Thresholds
    * apply HERE, so the same unpruned state serves any (minItemCount,
    * minPairCount) — and a-priori-pruned state gives identical output
    * for thresholds at or above its prune (the joins below drop
    * infrequent items either way).
    */
  def rulesFromState(itemCounts: DataFrame, pairCounts: DataFrame,
      basketCount: DataFrame, minItemCount: Int = 2, minPairCount: Int = 2,
      topK: Int = 50): DataFrame = {
    require(minItemCount >= 1 && minPairCount >= 1 && topK >= 1,
      s"thresholds must be >= 1, got $minItemCount/$minPairCount/$topK")
    val ic = itemCounts.filter(col("c_item") >= minItemCount)
    val pairs = pairCounts.filter(col("n_both") >= minPairCount)
    val directed = pairs.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("n_both"))
      .unionByName(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("n_both")))
    directed
      .join(ic.select(col("item").as("antecedent"),
        col("c_item").as("n_ante")), "antecedent")
      .join(ic.select(col("item").as("consequent"),
        col("c_item").as("n_cons")), "consequent")
      .crossJoin(broadcast(basketCount))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ante"), col("n_cons"),
        round(col("n_both").cast("double") / col("n_ante"), 6)
          .as("confidence"),
        round((col("n_baskets").cast("double") * col("n_both")) /
          (col("n_ante").cast("double") * col("n_cons")), 6).as("lift"))
      .orderBy(col("n_both").desc, col("antecedent"), col("consequent"))
      .limit(topK)
  }

  /** One-shot batch path: state with the a-priori pair prune at
    * `minItemCount`, rules served at the same thresholds.
    */
  def associationRules(items: DataFrame, basketCol: String, itemCol: String,
      minItemCount: Int = 2, minPairCount: Int = 2, topK: Int = 50)
      : DataFrame = {
    val (ic, pc, nb) = basketState(items, basketCol, itemCol,
      pruneItemCount = minItemCount)
    rulesFromState(ic, pc, nb, minItemCount, minPairCount, topK)
  }
}
