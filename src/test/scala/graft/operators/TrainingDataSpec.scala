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

  test("maskDigits hides all digits except the kept tail") {
    val got = Seq("Customer#000000042", "ab1", "12345")
      .toDF("s")
      .select(TrainingData.maskDigits(col("s"), keep = 4)).as[String]
      .collect()
    assert(got(0) === "Customer######0042")
    assert(got(1) === "ab1") // shorter than keep: untouched
    assert(got(2) === "#2345")
  }
}
