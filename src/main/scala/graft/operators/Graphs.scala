package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives beyond the iterative tier
  * ([[PageRank]], [[TrainingData]] connected components): exact triangle
  * counting by DEGREE ORIENTATION — the join-based MapReduce formulation
  * that stays tractable on skewed graphs.
  *
  * The naive triple-self-join enumerates every wedge at every vertex, so
  * one celebrity node of degree d contributes d² wedge rows — quadratic
  * blow-up exactly where real graphs are hottest. Orienting each edge
  * from its lower-(degree, id) endpoint to the higher one turns the graph
  * into a DAG where every vertex's OUT-degree is bounded by O(√m) on any
  * graph (and by the arboricity in general), so the wedge fan-out is
  * bounded per node no matter how skewed the in-degrees are; each
  * triangle is then found exactly once, at its lowest-ordered corner.
  * Both stages are plain shuffles on vertex keys — no driver state, no
  * iteration — so the plan scales with m^1.5 worst-case like the
  * classical result, not with the hottest degree squared.
  */
object Graphs {

  /** One-row summary (n_nodes, n_edges, n_triangles) of the undirected
    * simple graph whose edges are `edges(srcCol, dstCol)`. Self-loops are
    * dropped and duplicate/reversed edges collapse to one canonical
    * (min, max) edge, so the input may be a raw directed multi-edge
    * relation. Vertex ids must be integral.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // orient each edge from its lower (deg, id) endpoint to the higher:
    // out-fans are O(sqrt(m))-bounded, and (deg, id) is a TOTAL order so
    // every triangle keeps exactly one source corner
    val withDeg = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
    // wedges at the lowest corner: unordered pairs of out-neighbours,
    // normalized by the same (deg, id) order so the closing edge is
    // looked up in its oriented direction
    val w1 = oriented.select(col("src"), col("dst").as("b"),
      col("ddst").as("db"))
    val w2 = oriented.select(col("src"), col("dst").as("c"),
      col("ddst").as("dc"))
    val wedges = w1.join(w2, "src")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val closed = wedges.join(
      oriented.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"), "left_semi")
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }
}
