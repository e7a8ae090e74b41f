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
  * Float parity: counts are exact integers; confidence and lift are one
  * correctly-rounded IEEE division each of exact-integer doubles
  * (products stay < 2^53) — bit-identical cross-engine — and round(6)
  * for output.
  */
object Baskets {

  /** Top-`topK` directed rules antecedent→consequent ranked by
    * co-occurrence count (ties: antecedent, consequent — a total integer
    * order, so the cut is deterministic). Items below `minItemCount`
    * baskets are pruned before pairing; pairs below `minPairCount`
    * co-occurrences are dropped.
    *
    * Output: (antecedent, consequent, n_both, n_ante, n_cons,
    * confidence = n_both/n_ante, lift = N·n_both/(n_ante·n_cons)).
    */
  def associationRules(items: DataFrame, basketCol: String, itemCol: String,
      minItemCount: Int = 2, minPairCount: Int = 2, topK: Int = 50)
      : DataFrame = {
    require(minItemCount >= 1 && minPairCount >= 1 && topK >= 1,
      s"thresholds must be >= 1, got $minItemCount/$minPairCount/$topK")
    val b = items.select(col(basketCol).cast("long").as("basket"),
        col(itemCol).cast("long").as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val nBaskets = b.agg(count_distinct(col("basket")).as("n_baskets"))
    val itemCounts = b.groupBy(col("item"))
      .agg(count(lit(1)).as("c_item"))
      .filter(col("c_item") >= minItemCount)
    // frequent-item prune BEFORE pairing: the a-priori bound
    val qualified = b.join(itemCounts.select(col("item")), "item")
    val pairs = qualified.select(col("basket"), col("item").as("ia"))
      .join(qualified.select(col("basket"), col("item").as("ib")), "basket")
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairCount)
    // both rule directions from each unordered pair
    val directed = pairs.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("n_both"))
      .unionByName(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("n_both")))
    directed
      .join(itemCounts.select(col("item").as("antecedent"),
        col("c_item").as("n_ante")), "antecedent")
      .join(itemCounts.select(col("item").as("consequent"),
        col("c_item").as("n_cons")), "consequent")
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ante"), col("n_cons"),
        round(col("n_both").cast("double") / col("n_ante"), 6)
          .as("confidence"),
        round((col("n_baskets").cast("double") * col("n_both")) /
          (col("n_ante").cast("double") * col("n_cons")), 6).as("lift"))
      .orderBy(col("n_both").desc, col("antecedent"), col("consequent"))
      .limit(topK)
  }
}
