package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank matches a naive in-memory recompute with decimal-summed terms") {
    val nodes = Seq("a", "b", "c", "d").toDF("node")
    val edges = Seq(
      ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
      ("c", "a", 1.0), ("d", "a", 1.0), // d has out-edges but none incoming
    ).toDF("from", "to", "weight")
    val got = PageRank.run(nodes, edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val ns = Seq("a", "b", "c", "d")
    val es = Seq(("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
      ("c", "a", 1.0), ("d", "a", 1.0))
    val out = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var p = ns.map(_ -> 1.0 / 4).toMap
    for (_ <- 1 to 3) {
      p = ns.map { v =>
        val terms = es.filter(_._2 == v)
          .map { case (u, _, w) => BigDecimal(p(u) * w / out(u))
            .setScale(20, BigDecimal.RoundingMode.HALF_UP) }
        v -> (0.15 / 4 + 0.85 * terms.sum.toDouble)
      }.toMap
    }
    assert(got === p)
    // no incoming edges: d sits at the floor
    assert(got("d") === 0.15 / 4)
  }

  test("pagerank mass stays ~1 when every node has out-edges") {
    val nodes = Seq("a", "b", "c").toDF("node")
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
      .toDF("from", "to", "weight")
    val total = PageRank.run(nodes, edges, iters = 5)
      .agg(sum(col("p"))).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-12, s"mass drifted: $total")
  }
}
