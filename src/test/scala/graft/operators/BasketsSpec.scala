package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  // baskets: {1,2} x3, {1,2,3} x1, {3} x1, {4} x1 → N=6 baskets
  private def items = Seq(
    (10L, 1L), (10L, 2L),
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 2L),
    (13L, 1L), (13L, 2L), (13L, 3L),
    (14L, 3L), (15L, 4L)).toDF("basket", "item")

  test("associationRules: hand-computed support/confidence/lift") {
    val rules = Baskets.associationRules(items, "basket", "item",
        minItemCount = 2, minPairCount = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // item counts: 1→4, 2→4, 3→2; item 4 (count 1) pruned by minItemCount
    // pair (1,2) co-occurs 4x; (1,3)/(2,3) co-occur once → below minPair
    assert(rules.toSeq === Seq(
      (1L, 2L, 4L, 4L, 4L, 1.0, 1.5),  // conf 4/4, lift 6*4/(4*4)
      (2L, 1L, 4L, 4L, 4L, 1.0, 1.5)))
  }

  test("associationRules: infrequent items never pair (a-priori prune)") {
    val rules = Baskets.associationRules(items, "basket", "item",
      minItemCount = 3, minPairCount = 1, topK = 10).collect()
    // only items 1 and 2 survive minItemCount=3
    assert(rules.map(r => Set(r.getLong(0), r.getLong(1))).toSet ===
      Set(Set(1L, 2L)))
  }

  test("associationRules: duplicate item rows in one basket count once") {
    val dup = items.unionAll(Seq((10L, 1L), (10L, 2L)).toDF("basket", "item"))
    val a = Baskets.associationRules(items, "basket", "item", 2, 2, 10)
      .collect().map(_.toSeq)
    val b = Baskets.associationRules(dup, "basket", "item", 2, 2, 10)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("incremental state merge ≡ one-shot recompute, any basket split") {
    val big = (0L until 120L).flatMap(b =>
      Seq((b, b % 7), (b, b % 5 + 10), (b, b % 3 + 20)))
      .toDF("basket", "item")
    val oneShot = Baskets.associationRules(big, "basket", "item", 2, 2, 25)
      .collect().map(_.toSeq)
    for (mod <- Seq(2L, 3L)) {
      val (i1, p1, n1) = Baskets.basketState(
        big.filter(col("basket") % mod === 0), "basket", "item")
      val (i2, p2, n2) = Baskets.basketState(
        big.filter(col("basket") % mod =!= 0), "basket", "item")
      val ic = IncrementalAgg.mergeRollup(i1, i2, Seq("item"), Seq("c_item"))
      val pc = IncrementalAgg.mergeRollup(p1, p2, Seq("ia", "ib"),
        Seq("n_both"))
      val nb = IncrementalAgg.mergeRollup(n1.withColumn("k", lit(1)),
        n2.withColumn("k", lit(1)), Seq("k"), Seq("n_baskets")).drop("k")
      val merged = Baskets.rulesFromState(ic, pc, nb, 2, 2, 25)
        .collect().map(_.toSeq)
      assert(merged.toSeq === oneShot.toSeq, s"split mod $mod diverged")
    }
  }

  test("unpruned state serves ANY later threshold (a-priori-pruned agrees)") {
    val (ic, pc, nb) = Baskets.basketState(items, "basket", "item")
    val fromUnpruned = Baskets.rulesFromState(ic, pc, nb, 2, 2, 10)
      .collect().map(_.toSeq)
    val pruned = Baskets.associationRules(items, "basket", "item", 2, 2, 10)
      .collect().map(_.toSeq)
    assert(fromUnpruned.toSeq === pruned.toSeq)
  }

  test("associationRules: partitioning-invariant (decimal-free exact math)") {
    val big = (0L until 200L).flatMap(b =>
      Seq((b, b % 7), (b, b % 5 + 10), (b, b % 3 + 20)))
      .toDF("basket", "item")
    val r1 = Baskets.associationRules(big.repartition(1), "basket", "item",
      2, 2, 25).collect().map(_.toSeq)
    val r8 = Baskets.associationRules(big.repartition(8), "basket", "item",
      2, 2, 25).collect().map(_.toSeq)
    assert(r1.toSeq === r8.toSeq)
  }
}
