package graft.operators

import graft.SparkSpec

class GraphsSpec extends SparkSpec {

  test("triangleCount matches brute force on a deterministic random graph") {
    val rnd = new scala.util.Random(42)
    val n = 40
    val edges = (for {
      u <- 0 until n
      v <- u + 1 until n
      if rnd.nextDouble() < 0.15
    } yield (u.toLong, v.toLong)).toVector
    val eset = edges.toSet
    var tri = 0L
    for (a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n)
      if (eset((a.toLong, b.toLong)) && eset((b.toLong, c.toLong)) &&
        eset((a.toLong, c.toLong))) tri += 1
    import spark.implicits._
    // feed as a noisy directed multi-edge relation: every edge reversed
    // and duplicated, plus a self-loop — canonicalization must collapse it
    val noisy = edges ++ edges.map { case (u, v) => (v, u) } :+ (5L, 5L)
    val out = Graphs.triangleCount(noisy.toDF("src", "dst"), "src", "dst")
      .head()
    assert(out.getAs[Long]("n_triangles") === tri)
    assert(out.getAs[Long]("n_edges") === edges.size.toLong)
  }

  test("hot-node star plus one chord counts exactly one triangle") {
    import spark.implicits._
    // star center 0 → 1..50 (degree 50), chord (1,2): the only triangle
    // is {0,1,2}; degree orientation roots it at a LOW-degree corner so
    // the celebrity node fans out no wedges
    val edges = (1 to 50).map(i => (0L, i.toLong)) :+ (1L, 2L)
    val out = Graphs.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .head()
    assert(out.getAs[Long]("n_triangles") === 1L)
    assert(out.getAs[Long]("n_nodes") === 51L)
    assert(out.getAs[Long]("n_edges") === 51L)
  }

  test("triangle-free bipartite graph counts zero") {
    import spark.implicits._
    val edges = for (u <- 0L to 9L; v <- 10L to 19L) yield (u, v)
    val out = Graphs.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .head()
    assert(out.getAs[Long]("n_triangles") === 0L)
    assert(out.getAs[Long]("n_edges") === 100L)
  }
}
