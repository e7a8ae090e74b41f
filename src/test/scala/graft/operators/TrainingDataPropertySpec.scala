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
}
