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

  private def bfsMap(sources: Seq[Long], edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Int] = {
    import spark.implicits._
    Graphs.bfsDistances(sources.toDF("node"), edges.toDF("id_a", "id_b"),
        rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("bfsDistances: exact layers on a path graph") {
    // 0-1-2-3-4-5 path, source 0
    val path = (0L to 4L).map(i => (i, i + 1))
    assert(bfsMap(Seq(0L), path, rounds = 5) ===
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5))
  }

  test("bfsDistances: a hop budget below the diameter truncates reach") {
    val path = (0L to 4L).map(i => (i, i + 1))
    // 2 rounds: only nodes within 2 hops, each at its true distance
    assert(bfsMap(Seq(0L), path, rounds = 2) ===
      Map(0L -> 0, 1L -> 1, 2L -> 2))
  }

  test("bfsDistances: multi-source takes the minimum over seeds") {
    val path = (0L until 6L).map(i => (i, i + 1))
    // seeds at both ends: distances meet in the middle
    assert(bfsMap(Seq(0L, 6L), path, rounds = 6) ===
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 2, 5L -> 1, 6L -> 0))
  }

  test("bfsDistances: disconnected nodes never appear; edges are undirected") {
    val edges = Seq((10L, 11L), (12L, 13L), (11L, 10L), (10L, 10L))
    // directed duplicate + self-loop collapse; component of 12 unreached
    assert(bfsMap(Seq(10L), edges, rounds = 3) === Map(10L -> 0, 11L -> 1))
    // reverse direction also traversed (seed at the edge's dst side)
    assert(bfsMap(Seq(11L), edges, rounds = 3) === Map(11L -> 0, 10L -> 1))
  }

  private def coreMap(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, Long] = {
    import spark.implicits._
    Graphs.kCoreSurvivors(edges.toDF("id_a", "id_b"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("shortestPaths: exact weighted distances on a hand graph; " +
      "cheap long route beats expensive direct edge; budget truncates") {
    import spark.implicits._
    // 0 -5-> 1, 0 -1-> 2, 2 -1-> 3, 3 -1-> 1 : best 0→1 is 0,2,3,1 = 3
    val edges = Seq((0L, 1L, 5L), (0L, 2L, 1L), (2L, 3L, 1L),
      (3L, 1L, 1L)).toDF("id_a", "id_b", "w")
    val seeds = Seq(0L).toDF("id")
    def dists(rounds: Int): Map[Long, Long] =
      graft.operators.Graphs.shortestPaths(seeds, edges, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dists(4) === Map(0L -> 0L, 1L -> 3L, 2L -> 1L, 3L -> 2L))
    // one round: only direct edges reachable — 0→1 still costs 5
    assert(dists(1) === Map(0L -> 0L, 1L -> 5L, 2L -> 1L))
    // parallel edges take the cheaper; undirected: seed at 1 reaches 0
    val par = edges.unionByName(Seq((0L, 1L, 2L)).toDF("id_a", "id_b", "w"))
    assert(graft.operators.Graphs.shortestPaths(seeds, par, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .apply(1L) === 2L)
    assert(graft.operators.Graphs.shortestPaths(
        Seq(1L).toDF("id"), edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .apply(0L) === 3L)
  }

  test("shortestPaths matches a driver-side Dijkstra on a " +
      "deterministic random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40
    val raw = (1 to 160).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
        (rnd.nextInt(9) + 1).toLong)
    }.filter(e => e._1 != e._2)
    val edges = raw.toDF("id_a", "id_b", "w")
    val got = graft.operators.Graphs
      .shortestPaths(Seq(0L).toDF("id"), edges, rounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: plain Dijkstra over the symmetrized min-weight graph
    val adj = raw.flatMap(e => Seq(e, (e._2, e._1, e._3)))
      .groupBy(e => (e._1, e._2)).map { case ((a, b), es) =>
        (a, b, es.map(_._3).min) }
      .groupBy(_._1).map { case (a, es) =>
        a -> es.map(e => (e._2, e._3)).toSeq }
    val dist = scala.collection.mutable.Map(0L -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, 0L))(
      Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (dd, u) = pq.dequeue()
      if (dist(u) == dd)
        adj.getOrElse(u, Seq.empty).foreach { case (v, w) =>
          if (dist.get(v).forall(_ > dd + w)) {
            dist(v) = dd + w; pq.enqueue((dd + w, v))
          }
        }
    }
    assert(got === dist.toMap)
  }

  test("kCoreSurvivors: clique survives 2-core, tail chain peels away") {
    val clique = for (u <- 0L to 3L; v <- u + 1 to 3L) yield (u, v)
    val tail = Seq((3L, 10L), (10L, 11L), (11L, 12L))
    assert(coreMap(clique ++ tail, k = 2, rounds = 4) ===
      Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("kCoreSurvivors: a pure chain has no 2-core") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    assert(coreMap(chain, k = 2, rounds = 8) === Map.empty)
  }

  test("kCoreSurvivors: fixed rounds stop mid-peel deterministically") {
    // 10-node chain sheds its two endpoints per round; after 4 rounds
    // two middle nodes remain (not yet converged) with induced degree 1
    val chain = (0L until 9L).map(i => (i, i + 1))
    assert(coreMap(chain, k = 2, rounds = 4) === Map(4L -> 1L, 5L -> 1L))
  }

  test("kCoreSurvivors: cycle is its own 2-core at any round count") {
    val cycle = (0L to 5L).map(i => (i, (i + 1) % 6))
    assert(coreMap(cycle, k = 2, rounds = 6) ===
      (0L to 5L).map(_ -> 2L).toMap)
  }

  test("bfsDistances: cycle distances take the shorter way around") {
    val cycle = (0L to 5L).map(i => (i, (i + 1) % 6))
    assert(bfsMap(Seq(0L), cycle, rounds = 5) ===
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 2, 5L -> 1))
  }

  // sequential synchronous LPA reference: most-frequent neighbor label,
  // ties to the smallest, carry when voteless
  private def refLpa(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keySet.toSeq.sorted
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = nodes.map { n =>
        val votes = adj.getOrElse(n, Seq.empty).map(lab)
          .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        n -> (if (votes.isEmpty) lab(n)
              else votes.minBy { case (l, c) => (-c, l) }._1)
      }.toMap
    }
    lab
  }

  private def lpaMap(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("id_a", "id_b")
    val nodes = e.select(e("id_a").as("n"))
      .unionByName(e.select(e("id_b").as("n"))).distinct()
    Graphs.labelPropagation(nodes, e, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation: two triangles over a bridge split; ref-exact") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val got = lpaMap(g, 4)
    assert(got === refLpa(g, 4))
    // the dense triangles agree internally and differ across the bridge
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(4L) === got(5L) && got(5L) === got(6L))
    assert(got(1L) !== got(4L))
  }

  test("labelPropagation matches the reference on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 20
      val edges = Seq.fill(40)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      (1 to 4).foreach { r =>
        assert(lpaMap(edges, r) === refLpa(edges, r), s"rounds=$r")
      }
    }
  }
}
