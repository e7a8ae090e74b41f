package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h", "s0"),
    (2L, "a b c d e x y z", "s0"), // shares the 4-gram "a b c d" with 1
    (3L, "p q r s t u v w", "s1"),
    (4L, "a b c d e f g h", "s1"), // exact copy of 1
    (5L, "m m m m m m n n", "s1"), // degenerate repetition
    (6L, "", "s1"),
  ).toDF("doc_id", "text", "source")

  test("docShingles emits each distinct in-doc gram once") {
    val got = TrainingData.docShingles(
      Seq((1L, "x y x y x y")).toDF("doc_id", "text"), "text", "doc_id", 2)
      .collect().map(_.getString(1)).sorted
    assert(got.toSeq === Seq("x y", "y x")) // 5 bigram slots, 2 distinct
  }

  test("repetitionStats flags the degenerate doc and passes diverse ones") {
    val got = TrainingData.repetitionStats(docs, maxTopWordFrac = 0.5,
        maxTop2GramFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(6L)) // empty doc has no tokens
    val degenerate = got(5L)
    assert(degenerate.getAs[Long]("n_tokens") === 8L)
    assert(degenerate.getAs[Double]("top_word_frac") === 0.75) // 6 of 8 "m"
    // "m m" occurs 5 times of 7 bigrams
    assert(degenerate.getAs[Double]("top_2gram_frac") === 0.714286)
    assert(!degenerate.getAs[Boolean]("pass"))
    assert(got(1L).getAs[Boolean]("pass")) // all-distinct tokens: 1/8 each
    assert(got(1L).getAs[Double]("top_word_frac") === 0.125)
  }

  test("single-token doc has no 2-grams and a zero top_2gram_frac") {
    val got = TrainingData.repetitionStats(
      Seq((1L, "only")).toDF("doc_id", "text"), maxTopWordFrac = 2.0,
      maxTop2GramFrac = 2.0).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Double]("top_2gram_frac") === 0.0)
    assert(got(0).getAs[Boolean]("pass"))
  }

  test("boilerplateNgrams counts distinct docs, not occurrences") {
    val rep = Seq(
      (1L, "a b a b"), // "a b" twice in one doc -> still 1 doc
      (2L, "a b c"),
      (3L, "z z z"),
    ).toDF("doc_id", "text")
    val got = TrainingData.boilerplateNgrams(rep, n = 2, minDocs = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a b" -> 2L))
  }

  test("decontaminate reports per-test-doc overlap with the train split") {
    // Force the split assignment by text content: find which docs land
    // where and assert internal consistency instead of fixed ids.
    val out = TrainingData.decontaminate(docs, n = 4).collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // contaminated <= total grams
      val expected = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expected) < 1e-9)
    }
  }

  test("stratifiedSample takes exactly perStratum rows per source, ranks dense") {
    val got = TrainingData.stratifiedSample(docs.filter(length($"text") > 0),
        "source", 2)
      .collect().groupBy(_.getString(0))
    assert(got("s0").length === 2)
    assert(got("s1").length === 2) // 3 non-empty docs in s1, capped at 2
    assert(got("s1").map(_.getInt(2)).sorted.toSeq === Seq(1, 2))
  }

  test("stratifiedSample is deterministic across partitionings") {
    val a = TrainingData.stratifiedSample(docs, "source", 2).collect().toSet
    val b = TrainingData.stratifiedSample(docs.repartition(7), "source", 2)
      .collect().toSet
    assert(a === b)
  }

  test("vocabStats ranks by count desc then token, df counts distinct docs") {
    val got = TrainingData.vocabStats(docs, topK = 3).collect()
    assert(got.map(_.getInt(3)).toSeq === Seq(1, 2, 3))
    // "m" occurs 6 times in one doc; every other token <= 3 occurrences
    assert(got(0).getString(0) === "m")
    assert(got(0).getLong(1) === 6L)
    assert(got(0).getLong(2) === 1L)
    // "a"/"b"/"c"/"d" all occur 3 times in 3 docs; tie broken by token
    assert(got(1).getString(0) === "a")
    assert(got(1).getLong(2) === 3L)
  }

  test("domainMixReport keeps a deterministic content-hash fraction") {
    val rep = TrainingData.domainMixReport(docs, _ => lit(100))
      .collect().map(r => r.getString(0) -> r).toMap
    // rate 100%: everything kept, realized rate exactly 1.0
    assert(rep("s0").getAs[Long]("n_kept") === 2L)
    assert(rep("s1").getAs[Long]("n_kept") === 4L)
    assert(rep("s1").getAs[Double]("realized_rate") === 1.0)
    val none = TrainingData.domainMixReport(docs, _ => lit(0)).collect()
    assert(none.forall(_.getAs[Long]("n_kept") === 0L))
    assert(none.forall(_.getAs[Long]("tokens_kept") === 0L))
  }

  test("chunkWindows: coverage, overlap, short tail, and cross-doc hash equality") {
    // 60 tokens at size 32 / stride 24 -> starts 0,24,48 with lens 32,32,12
    val text60 = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text60), (2L, text60), (3L, "a b"), (4L, "  "))
      .toDF("doc_id", "text")
    val got = TrainingData.chunkWindows(docs, chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(d1.toSeq === Seq((0L, 0L, 32L), (1L, 24L, 32L), (2L, 48L, 12L)))
    // last chunk ends exactly at n_tokens: full coverage, nothing past the end
    assert(d1.last._2 + d1.last._3 === 60L)
    // identical docs produce identical chunk hashes (the dedup key)
    val h1 = got.filter(_.getLong(0) == 1L).map(_.getString(4)).toSeq
    val h2 = got.filter(_.getLong(0) == 2L).map(_.getString(4)).toSeq
    assert(h1 === h2 && h1.distinct.length === 3)
    // a doc shorter than one window yields exactly one short chunk
    assert(got.filter(_.getLong(0) == 3L).map(r => (r.getLong(2), r.getLong(3)))
      .toSeq === Seq((0L, 2L)))
    // blank docs chunk to nothing; stride > chunkSize is rejected
    assert(!got.exists(_.getLong(0) == 4L))
    intercept[IllegalArgumentException] {
      TrainingData.chunkWindows(docs, chunkSize = 8, stride = 9)
    }
  }

  test("connectedComponents resolves a chain transitively to the min id") {
    // a~b and b~c but NOT a~c: pairwise drop logic misses (a,c);
    // component resolution must put all three in component 1.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = TrainingData.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents handles empty edge sets and long chains") {
    val nodes = (1L to 8L).toDF("doc_id")
    val none = TrainingData.connectedComponents(nodes, Seq.empty[(Long, Long)]
      .toDF("id_a", "id_b")).collect()
    assert(none.forall(r => r.getLong(0) === r.getLong(1)))
    // an 8-node path has diameter 7 — min-label propagation needs one
    // iteration per hop; threshold 0 forces the distributed loop (the
    // default would take the union-find fast path on 7 edges)
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = TrainingData.connectedComponents(nodes, chain,
      smallEdgeThreshold = 0L).collect()
    assert(got.forall(_.getLong(1) === 1L))
    // and the fast path agrees with the loop on the same graph
    val fast = TrainingData.connectedComponents(nodes, chain).collect()
    assert(fast.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      got.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("connectedComponents fails loudly instead of returning non-converged labels") {
    val nodes = (1L to 6L).toDF("doc_id")
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      TrainingData.connectedComponents(nodes, chain, maxIter = 2,
        smallEdgeThreshold = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponentsStar resolves a chain LONGER than min-label's default budget") {
    // a 30-hop path exceeds connectedComponents' default maxIter=20 (one
    // hop per round); the star variant's logarithmic rounds absorb it —
    // plus a second component and isolated nodes to catch cross-talk
    val nodes = (1L to 35L).toDF("doc_id")
    val edges = ((1L to 30L).map(i => (i, i + 1)) ++ Seq((33L, 34L)))
      .toDF("id_a", "id_b")
    val got = TrainingData.connectedComponentsStar(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ((1L to 31L).map(_ -> 1L) ++
      Seq(32L -> 32L, 33L -> 33L, 34L -> 33L, 35L -> 35L)).toMap
    assert(got === want)
    // and min-label does fail on this diameter at its default budget,
    // which is exactly why the star variant exists
    intercept[IllegalStateException] {
      TrainingData.connectedComponents(nodes, edges,
        smallEdgeThreshold = 0L).collect()
    }
  }

  test("packSequences chunks the token stream per bucket deterministically") {
    // Single bucket (buckets=1): all docs in hash order; seqLen 10.
    val ds = Seq(
      (1L, "a a a a a a"), // 6 tokens
      (2L, "b b b b b b"), // 6 tokens
      (3L, "c c"),         // 2 tokens
    ).toDF("doc_id", "text")
    val got = TrainingData.packSequences(ds, seqLen = 10, buckets = 1)
      .orderBy("seq_id").collect()
    // total 14 tokens -> sequences 0 and 1; doc boundaries depend on md5
    // order, but totals must conserve tokens and every doc lands once
    assert(got.map(_.getLong(2)).sum === 14L)
    assert(got.map(_.getLong(1)).sum === 3L)
    assert(got.forall(_.getLong(0) < (1L << 40))) // all in bucket 0
    // determinism across partitionings
    val again = TrainingData.packSequences(ds.repartition(5), seqLen = 10,
      buckets = 1).orderBy("seq_id").collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("packSequences assigns a doc to the sequence its first token lands in") {
    // One doc per bucket impossible to force; instead verify the
    // arithmetic on a single 25-token doc with seqLen 10: starts at 0 ->
    // sequence 0 despite spanning three windows.
    val one = Seq((1L, Seq.fill(25)("w").mkString(" "))).toDF("doc_id", "text")
    val got = TrainingData.packSequences(one, seqLen = 10, buckets = 1).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) % (1L << 40) === 0L)
    assert(got(0).getLong(2) === 25L)
  }

  test("tfidfTopTerms scores tf * N/df and ranks per doc") {
    val ds = Seq(
      (1L, "x x x y"),   // tf(x)=3, df(x)=1, N=2 -> score 6.0
      (2L, "y y z"),     // y appears in both docs: df(y)=2
    ).toDF("doc_id", "text")
    val got = TrainingData.tfidfTopTerms(ds, topPerDoc = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(got((1L, "x")).getAs[Double]("score") === 6.0) // 3 * 2/1
    assert(got((1L, "x")).getAs[Int]("rk") === 1)
    assert(got((1L, "y")).getAs[Double]("score") === 1.0) // 1 * 2/2
    assert(got((2L, "z")).getAs[Double]("score") === 2.0) // 1 * 2/1
    assert(got((2L, "y")).getAs[Double]("score") === 2.0) // 2 * 2/2
    // tie at 2.0 in doc 2: token order breaks it -> y before z
    assert(got((2L, "y")).getAs[Int]("rk") === 1)
    assert(got((2L, "z")).getAs[Int]("rk") === 2)
  }

  test("lengthGate drops docs outside the discrete quantile band") {
    // 10 docs with token counts 1..10; p05 -> lo = 1 (cum 1 >= 0.5),
    // p95 -> hi = 10 (cum 10 >= 9.5); band keeps everything here, so
    // tighten: pLow=0.25 -> lo = 3 (cum 3 >= 2.5), pHigh=0.75 -> hi = 8.
    val ds = (1 to 10).map(i => (i.toLong, Seq.fill(i)("t").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val got = TrainingData.lengthGate(ds, pLow = 0.25, pHigh = 0.75).collect()
    assert(got.length === 1)
    assert(got(0).getAs[Long]("lo") === 3L)
    assert(got(0).getAs[Long]("hi") === 8L)
    assert(got(0).getAs[Long]("n_docs") === 6L) // counts 3,4,5,6,7,8
    assert(got(0).getAs[Long]("total_tokens") === 33L)
  }

  test("vocabStats plan takes the distributed top-k before the rank window") {
    val plan = executedPlan(TrainingData.vocabStats(docs, topK = 2))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("stratifiedSample plan pushes the rank filter into WindowGroupLimit") {
    val plan = executedPlan(TrainingData.stratifiedSample(docs, "source", 2))
    assert(plan.contains("WindowGroupLimit"))
  }

  test("tfidf plan broadcasts the corpus-size aggregate and group-limits the rank") {
    val plan = executedPlan(TrainingData.tfidfTopTerms(docs, topPerDoc = 2))
    assert(plan.contains("BroadcastExchange"))
    assert(plan.contains("WindowGroupLimit"))
  }

  test("packSequences plan partitions the cumsum window by bucket, never globally") {
    val plan = executedPlan(TrainingData.packSequences(docs, seqLen = 10, buckets = 4))
    assert(plan.contains("hashpartitioning(bucket"))
    // a global cumsum would show as a single-partition sort window
    assert(!plan.contains("SinglePartition"))
  }

  test("maskDigits hides all digits except the kept tail") {
    val got = Seq("Customer#000000042", "ab1", "12345")
      .toDF("s")
      .select(TrainingData.maskDigits(col("s"), keep = 4)).as[String]
      .collect()
    assert(got(0) === "Customer######0042")
    assert(got(1) === "ab1") // shorter than keep: untouched
    assert(got(2) === "#2345")
  }

  test("repeatedSpans merges overlapping duplicated windows into maximal spans") {
    val d = Seq(
      (1L, "a b c d e f"),   // windows abc(0) bcd(1) cde(2) def(3)
      (2L, "z a b c d y"),   // shares "a b c"(1) and "b c d"(2)
    ).toDF("doc_id", "text")
    val got = TrainingData.repeatedSpans(d, n = 3, minDocs = 2L)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // doc1 hits pos {0,1} -> one span [0,3]; doc2 hits pos {1,2} -> [1,4]
    assert(got.toSeq === Seq((1L, 0L, 3L, 4L, 2L), (2L, 1L, 4L, 4L, 2L)))
  }

  test("repeatedSpans splits islands when flagged windows sit further than n apart") {
    val d = Seq(
      (1L, "a b c x1 x2 x3 x4 x5 x6 b c d"), // hits at pos 0 and 9, gap 9 > 3
      (2L, "a b c q"),                        // shares "a b c"
      (3L, "q b c d"),                        // shares "b c d"
    ).toDF("doc_id", "text")
    val got = TrainingData.repeatedSpans(d, n = 3, minDocs = 2L)
      .filter($"doc_id" === 1L).orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 2L), (9L, 11L)))
  }

  test("tokenBudgetPlan computes integer epochs and partial-epoch rate") {
    val d = Seq(
      (1L, "t1 t2 t3 t4", "s0"), (2L, "u1 u2 u3 u4", "s0"), // 8 tokens
      (3L, "v1 v2 v3 v4 v5", "s1"),                          // 5 tokens
    ).toDF("doc_id", "text", "source")
    val budget: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      src => when(src === "s0", lit(20L)).otherwise(lit(3L))
    val got = TrainingData.tokenBudgetPlan(d, budget).orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    // s0: 20 div 8 = 2 epochs, rem 4 -> 50%; s1: 3 div 5 = 0 epochs, rem 3 -> 60%
    assert(got.toSeq === Seq(("s0", 8L, 2L, 4L, 50L), ("s1", 5L, 0L, 3L, 60L)))
  }

  test("epochExpand emits every full epoch and hash-gates only the partial one") {
    val d = Seq(
      (1L, "t1 t2 t3 t4", "s0"), (2L, "u1 u2 u3 u4", "s0"),
      (3L, "v1 v2 v3 v4 v5", "s1"),
    ).toDF("doc_id", "text", "source")
    val budget: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      src => when(src === "s0", lit(20L)).otherwise(lit(3L))
    val got = TrainingData.epochExpand(d, budget)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // s0 docs always carry epochs 0 and 1; epoch 2 is the hash-gated partial
    assert(byDoc(1L).startsWith(Seq(0L, 1L)) && byDoc(2L).startsWith(Seq(0L, 1L)))
    assert(byDoc(1L).forall(_ <= 2L) && byDoc(2L).forall(_ <= 2L))
    // s1 has zero full epochs: doc 3 appears at most once, only as epoch 0
    assert(byDoc.getOrElse(3L, Seq.empty).forall(_ === 0L))
    // determinism: a second run returns the identical assignment
    val again = TrainingData.epochExpand(d, budget)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // a negative budget clamps to zero epochs instead of emitting
    // phantom descending-sequence rows
    val neg = TrainingData.epochExpand(d,
      _ => org.apache.spark.sql.functions.lit(-5L))
      .collect().map(r => r.getLong(2))
    assert(neg.forall(_ === 0L))
  }

  test("buildVocab + encodeCorpus: dense frequency ids, OOV -> -1, order preserved") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "unique"),
    ).toDF("doc_id", "text")
    val vocab = TrainingData.buildVocab(d, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the:3 -> id 0, sat:2 -> id 1; everything else below threshold
    assert(vocab.toSeq.sortBy(_._3) === Seq(("the", 3L, 0L), ("sat", 2L, 1L)))
    val enc = TrainingData.encodeCorpus(d, TrainingData.buildVocab(d, minCount = 2L))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getLong(2)))
      .sortBy(_._1)
    assert(enc.toSeq === Seq(
      (1L, List(0L, -1L, 1L, -1L, 0L, -1L), 6L),
      (2L, List(0L, -1L, 1L), 3L),
      (3L, List(-1L), 1L)))
  }

  test("connectedComponents accepts non-long id types (distributed path)") {
    // the count-adaptive collected fast path reads Long ids; any other id
    // type must route to the type-agnostic distributed loop, not crash
    val nodes = Seq("a", "b", "c", "d").toDF("doc_id")
    val e = Seq(("a", "b"), ("c", "b")).toDF("id_a", "id_b")
    val got = TrainingData.connectedComponents(nodes, e)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d"))
  }

  test("tokenBudgetPlan reports zero epochs for an all-blank source instead of failing") {
    val d = Seq((1L, "", "s0"), (2L, "  ", "s0"), (3L, "a b", "s1"))
      .toDF("doc_id", "text", "source")
    val got = TrainingData.tokenBudgetPlan(d,
        _ => org.apache.spark.sql.functions.lit(10L))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4), r.getLong(6)))
    assert(got.toSeq === Seq(("s0", 0L, 0L, 0L), ("s1", 2L, 5L, 0L)))
  }

  test("blocklistAudit counts distinct blocklist hits map-side") {
    val d = Seq(
      (1L, "good clean text"),
      (2L, "bad bad ugly text"),   // "bad" twice counts once
      (3L, ""),
    ).toDF("doc_id", "text")
    val got = TrainingData.blocklistAudit(d, Seq("bad", "ugly", "evil"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq((1L, 0L, false), (2L, 2L, true)))
  }

  test("bigramScore is integer-exact against hand-computed transitions") {
    val d = Seq(
      (0L, "a b"),        // (a,b): c=2, c(a,.)=3 → 666666
      (1L, "a b a c"),    // + (b,a): 1/1 → 1000000; (a,c): 1/3 → 333333
      (2L, "solo"),       // <2 tokens: no bigrams, no output row
    ).toDF("doc_id", "text")
    val got = TrainingData.bigramScore(d, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // d1 avg = 1999999/3 ≈ 666666.33 > d0 avg = 666666
    assert(got.toSeq === Seq((1L, 3L, 1999999L), (0L, 1L, 666666L)))
  }

  test("weightedSample: priorities equal an explicit per-replica min") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 40L).map(i => (i, s"document number $i payload"))
      .toDF("doc_id", "text")
    val w = (col("doc_id") % 5 + 1).cast("int")
    val got = TrainingData.weightedSample(docs, w, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // re-derive each row's priority with an explode (independent shape)
    val expected = docs.select(col("doc_id"), col("text"), w.as("w"),
        explode(sequence(lit(1), w)).as("i"))
      .select(col("doc_id"), col("w"),
        conv(substring(md5(concat(col("text"), lit(":"),
          col("i").cast("string"))), 1, 8), 16, 10).cast("long").as("h"))
      .groupBy("doc_id", "w").agg(min("h").as("priority"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
      .toSet
    assert(got.toSet === expected)
    // ranked ascending by (priority, id), k rows max
    assert(got.sortBy(t => (t._3, t._1)).toSeq === got.toSeq)
  }

  test("weightedSample: raising a weight never worsens its priority") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def priorities(w: org.apache.spark.sql.Column) =
      TrainingData.weightedSample(docs, w, k = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val p1 = priorities(lit(1))
    val p4 = priorities(lit(4))
    assert((0L until 30L).forall(i => p4(i) <= p1(i)))
    // weight is clamped to maxWeight
    val clamped = TrainingData.weightedSample(docs, lit(10_000), k = 5,
      maxWeight = 8).collect().map(_.getLong(1)).toSet
    assert(clamped === Set(8L))
  }

  test("weightedSample: null text/id rows drop; null weight acts as 1") {
    import org.apache.spark.sql.functions._
    val docs = Seq((Some(1L), Some("alpha"), Some(3)),
      (Some(2L), None, Some(3)),         // null text: no priority — drop
      (None, Some("beta"), Some(3)),     // null id: drop
      (Some(3L), Some("gamma"), None))   // null weight: clamp to 1, keep
      .toDF("doc_id", "text", "w")
    val got = TrainingData.weightedSample(docs, col("w"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 3L))
    assert(got(1L) === 3L && got(3L) === 1L)
    // and no NULL priority ever reaches the ranking
    assert(TrainingData.weightedSample(docs, col("w"), k = 10)
      .filter(col("priority").isNull).count() === 0)
  }

  test("clusterSplitAssign: leakage-free by construction, exact " +
      "Fibonacci-bucket arithmetic, sane proportions") {
    import org.apache.spark.sql.functions._
    // 1000 docs in 300 components (multi-doc clusters for ids < 200)
    val comps = (0L until 1000L)
      .map(id => (id, if (id < 600) id % 200 else id - 400))
      .toDF("doc_id", "component")
    val assigned = TrainingData.clusterSplitAssign(comps)
    // no component spans splits
    assert(assigned.groupBy("component")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() === 0)
    // assignment matches the documented formula exactly
    val bad = assigned.filter(col("split") =!=
      when((col("component") * 2654435761L % 4294967296L) % 100 < 80, "train")
        .when((col("component") * 2654435761L % 4294967296L) % 100 < 90, "valid")
        .otherwise("test")).count()
    assert(bad === 0)
    // 600 distinct components, hash-uniform: each split non-empty and
    // train the clear majority
    val byn = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byn.keySet === Set("train", "valid", "test"))
    assert(byn("train") > byn("valid") && byn("train") > byn("test"))
    // custom percentages validated
    intercept[IllegalArgumentException](
      TrainingData.clusterSplitAssign(comps, trainPct = 90, validPct = 10))
  }

  test("temperatureMixReport: sqrt-flattened keep rates — smallest " +
      "domain keeps everything, thresholds formula-exact, corpus never " +
      "shuffles (broadcast join)") {
    import spark.implicits._
    // three domains: 100 / 400 / 25 docs — rates sqrt(25/n)
    val docs = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 500L).map(i => (i, "b")) ++
      (500L until 525L).map(i => (i, "c")))
      .toDF("doc_id", "source")
    val rep = graft.operators.TrainingData.temperatureMixReport(docs)
    val rows = rep.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def thr(n: Long) =
      math.floor(math.sqrt(25.0 / n) * 4294967296.0).toLong
    assert(rows("a")._2 === thr(100) && rows("b")._2 === thr(400) &&
      rows("c")._2 === thr(25))
    // smallest domain: threshold = 2^32 → every doc kept
    assert(rows("c")._3 === 25L)
    // kept counts match the per-doc formula exactly
    def kept(lo: Long, hi: Long, t: Long) = (lo until hi).count(id =>
      java.lang.Math.floorMod(id * 2654435761L, 4294967296L) < t).toLong
    assert(rows("a")._3 === kept(0, 100, thr(100)))
    assert(rows("b")._3 === kept(100, 500, thr(400)))
    // partitioning invariance
    val rep2 = graft.operators.TrainingData
      .temperatureMixReport(docs.repartition(7))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rep2 === rows.map { case (k, v) => k -> v._3 })
    // the corpus side joins broadcast — no corpus shuffle
    val plan = executedPlan(rep)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }
}
