package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants for the training-data curation operators:
  * random graphs against a brute-force union-find, random corpora
  * against Scala-side recomputation of packing, gating, and
  * contamination — the distributed plan must agree with the obvious
  * sequential definition on every input.
  */
class TrainingDataPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, minSuccessful: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  // --- connected components vs brute-force union-find ----------------------

  private val genGraph: Gen[(List[Long], List[(Long, Long)])] = for {
    n <- Gen.choose(1, 18)
    nodes = (1L to n.toLong).toList
    nEdges <- Gen.choose(0, 24)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(1L, n.toLong)
      b <- Gen.choose(1L, n.toLong)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield (nodes, edges.distinct)

  private def unionFind(nodes: List[Long], edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(x => x -> find(x)).toMap
  }

  test("connectedComponents equals brute-force union-find on random graphs") {
    // threshold 0 forces the distributed min-label loop — the default
    // would route every generated graph through the driver-side fast
    // path, which the next test covers
    check(Prop.forAll(genGraph) { case (nodes, edges) =>
      val expected = unionFind(nodes, edges)
      val got = TrainingData.connectedComponents(
          nodes.toDF("doc_id"), edges.toDF("id_a", "id_b"),
          smallEdgeThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    })
  }

  test("fast path: pinned 11-parent-entry case (HashMap grow-on-update)") {
    // regression: scala 2.13 HashMap.put grows the table when
    // contentSize+1 >= threshold even when only UPDATING an existing
    // key, so path compression during a live keys iteration rehashed an
    // 11-entry parent map (threshold 12) and silently dropped node 18's
    // label — the fast path must snapshot keys before resolving
    val nodes = List(3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 13L, 14L, 17L, 18L)
    val edges = List((4L, 3L), (3L, 7L), (5L, 14L), (3L, 6L), (5L, 8L),
      (3L, 10L), (5L, 3L), (4L, 18L), (4L, 13L), (4L, 9L), (3L, 17L))
    val got = TrainingData.connectedComponents(
        nodes.toDF("doc_id"), edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === nodes.map(_ -> 3L).toMap)
  }

  test("count-adaptive fast path equals union-find on random graphs") {
    check(Prop.forAll(genGraph) { case (nodes, edges) =>
      val expected = unionFind(nodes, edges)
      val got = TrainingData.connectedComponents(
          nodes.toDF("doc_id"), edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    })
  }

  test("connectedComponentsStar equals union-find on random graphs") {
    check(Prop.forAll(genGraph) { case (nodes, edges) =>
      val expected = unionFind(nodes, edges)
      val got = TrainingData.connectedComponentsStar(
          nodes.toDF("doc_id"), edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }, minSuccessful = 8)
  }

  // --- random corpora ------------------------------------------------------

  private val genDoc: Gen[String] =
    Gen.choose(0, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("ab", "cd", "ef", "gh", "ij"))).map(_.mkString(" "))

  private val genCorpus: Gen[List[(Long, String)]] =
    Gen.choose(1, 14).flatMap(n =>
      Gen.listOfN(n, genDoc).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))

  private def tokens(t: String): List[String] =
    t.trim.split("\\s+").toList.filter(_.nonEmpty)

  test("packSequences conserves docs and tokens and assigns by cumulative start") {
    check(Prop.forAll(genCorpus) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val got = TrainingData.packSequences(df, seqLen = 5, buckets = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val nonEmpty = corpus.filter { case (_, t) => tokens(t).nonEmpty }
      got.map(_._2).sum == nonEmpty.length &&
        got.map(_._3).sum == nonEmpty.map(d => tokens(d._2).length).sum &&
        got.map(_._1).distinct.length == got.length
    })
  }

  test("lengthGate bounds are the discrete quantiles of the token counts") {
    check(Prop.forAll(genCorpus) { corpus =>
      val df = corpus.map { case (i, t) => (i, t, "xx") }.toDF("doc_id", "text", "lang")
      val counts = corpus.map(d => tokens(d._2).length.toLong).sorted
      val n = counts.length
      def discrete(p: Double): Long = {
        // smallest value whose cumulative count reaches p*n, replaying
        // the operator's double comparison exactly
        val cum = counts.zipWithIndex.map { case (v, i) => (v, i + 1L) }
        cum.collectFirst { case (v, c) if c >= p * n => v }.get
      }
      val got = TrainingData.lengthGate(df, pLow = 0.25, pHigh = 0.75).collect()
      if (got.isEmpty) {
        // possible only if the gate dropped everything — never happens
        // with a non-empty corpus since lo/hi are attained values
        false
      } else {
        val (lo, hi) = (got.head.getAs[Long]("lo"), got.head.getAs[Long]("hi"))
        val survivors = counts.count(c => c >= lo && c <= hi)
        lo == discrete(0.25) && hi == discrete(0.75) &&
          got.head.getAs[Long]("n_docs") == survivors
      }
    })
  }

  test("decontaminate matches brute-force shingle intersection") {
    check(Prop.forAll(genCorpus) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val n = 2
      def grams(t: String): Set[String] =
        tokens(t).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      // replicate the md5 split buckets engine-side
      val buckets = graft.functions.TextFunctions
      val withBucket = df.select($"doc_id", $"text",
        buckets.splitBucket($"text", 100).as("b"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val train = withBucket.filter(_._3 < 80)
      val test = withBucket.filter(_._3 >= 90)
      val trainGrams = train.flatMap(d => grams(d._2)).toSet
      val expected = test.map { case (id, t, _) => id -> grams(t) }
        .filter(_._2.nonEmpty)
        .map { case (id, g) => id -> (g.size.toLong, g.count(trainGrams).toLong) }
        .toMap
      val got = TrainingData.decontaminate(df, n = n)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == expected
    })
  }

  // --- repeated spans vs naive window-flag-and-merge -----------------------

  test("repeatedSpans matches naive flag-and-merge on random corpora") {
    check(Prop.forAll(genCorpus, Gen.choose(1, 3)) { (corpus, n) =>
      val df = corpus.toDF("doc_id", "text")
      // naive: every n-token window occurring in >= 2 distinct docs,
      // merged per doc when starts are within n
      val windows = corpus.flatMap { case (id, t) =>
        tokens(t).sliding(n).filter(_.length == n).zipWithIndex
          .map { case (w, p) => (id, p.toLong, w.mkString(" ")) }
      }
      val dup = windows.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val expected = windows.filter(w => dup(w._3))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        .flatMap { case (id, ps) =>
          val islands = ps.foldLeft(List.empty[List[Long]]) {
            case (Nil, p) => List(List(p))
            case (cur :: done, p) if p - cur.head <= n => (p :: cur) :: done
            case (acc, p) => List(p) :: acc
          }
          islands.map(is => (id, is.last, is.head + n - 1,
            is.head + n - 1 - is.last + 1, is.size.toLong))
        }.toSet
      val got = TrainingData.repeatedSpans(df, n = n, minDocs = 2L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      got == expected
    })
  }

  // --- CDC apply vs naive per-key replay -----------------------------------

  test("Cdc.applyChanges matches a naive per-key replay on random feeds") {
    val genCase: Gen[(List[(Long, String, Double)], List[(Long, String, Long, String, Double)])] =
      for {
        nKeys <- Gen.choose(1, 10)
        snapKeys <- Gen.someOf(1L to nKeys.toLong)
        nCh <- Gen.choose(0, 20)
        chKeys <- Gen.listOfN(nCh, Gen.choose(1L, nKeys.toLong))
      } yield {
        val snapshot = snapKeys.toList.sorted.map(k => (k, s"s$k", k * 1.5))
        // one version sequence per key keeps (key, version) unique
        val counters = scala.collection.mutable.Map.empty[Long, Long]
        val changes = chKeys.zipWithIndex.map { case (k, i) =>
          val v = counters.updateWith(k)(c => Some(c.getOrElse(0L) + 1L)).get
          val op = (i % 3) match {
            case 0 => "U"; case 1 => "D"; case 2 => "I"
          }
          (k, op, v, s"c$k-$v", k * 10.0 + v)
        }
        (snapshot, changes)
      }
    check(Prop.forAll(genCase) { case (snapshot, changes) =>
      val snapDf = snapshot.toDF("k", "status", "amount")
      val chDf = changes.toDF("k", "op", "version", "status", "amount")
      val expected = {
        val byKey = changes.groupBy(_._1)
        val allKeys = (snapshot.map(_._1) ++ changes.map(_._1)).distinct
        allKeys.flatMap { k =>
          byKey.get(k).map(_.maxBy(_._3)) match {
            case Some((_, "D", _, _, _)) => None
            case Some((_, _, _, st, am)) => Some((k, st, am))
            case None => snapshot.find(_._1 == k)
          }
        }.toSet
      }
      val got = Cdc.applyChanges(snapDf, chDf, "k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      got == expected
    })
  }
}
