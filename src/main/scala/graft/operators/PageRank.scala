package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic PageRank over a weighted directed edge table — the
  * iterative-algorithm discipline the engine's connected components
  * established, extended to floating-point state: every per-edge
  * contribution `p * w / out` is computed in double (bit-identical
  * per-term across engines), but the per-node SUM runs over
  * `decimal(38,20)` casts, so accumulation order — the one thing a
  * distributed engine cannot pin — can never change the result: re-running
  * on any partitioning reproduces the exact same doubles. (Cross-ENGINE
  * replay carries one caveat: the double→decimal cast itself can differ
  * by 1 ulp between implementations — Spark converts via the shortest
  * decimal representation, DuckDB via scaled multiply — so the oracle
  * compares at 6 rounded decimals, like the cosine family.)
  *
  * The iteration count is a parameter, not a convergence test: a fixed
  * unrolled plan (no driver-side loop decisions) keeps the whole
  * computation one declarative query — the right shape when the node set
  * is bounded (here: event types, categories, domains), which is where
  * PageRank-style scoring shows up inside a data pipeline.
  */
object PageRank {

  /** @param edges (from, to, weight) rows; weight > 0, parallel edges
    *   pre-aggregated by the caller
    * @param nodes single-column node set (must cover every edge endpoint)
    */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85, base: Double = 0.15): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val nodeCol = nodes.columns.head
    val n = nodes.select(col(nodeCol).as("node"))
    val cnt = broadcast(n.agg(count(lit(1)).as("c")))
    val out = edges.groupBy(col("from")).agg(sum(col("weight")).as("out_w"))
    val e = edges.join(out, "from")
    var pr = n.crossJoin(cnt).select(col("node"), (lit(1.0) / col("c")).as("p"))
    for (_ <- 1 to iters) {
      val contrib = e.join(pr, col("from") === col("node"))
        .select(col("to"),
          (col("p") * col("weight") / col("out_w"))
            .cast("decimal(38,20)").as("t"))
        .groupBy(col("to")).agg(sum(col("t")).cast("double").as("s"))
      pr = n.join(contrib, n("node") === contrib("to"), "left")
        .crossJoin(cnt)
        .select(col("node"),
          (lit(base) / col("c") + lit(damping) * coalesce(col("s"), lit(0.0)))
            .as("p"))
    }
    pr
  }
}
