package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect()(0).getAs[T]("r")

  test("tokenCount: whitespace runs, empty-safe") {
    assert(one[Int](TextFunctions.tokenCount(col("t")), "a b  c") === 3)
    assert(one[Int](TextFunctions.tokenCount(col("t")), "") === 0)
    assert(one[Int](TextFunctions.tokenCount(col("t")), "  ") === 0)
  }

  test("bpeishTokenCount: letter runs, digit runs, single symbols") {
    assert(one[Int](TextFunctions.bpeishTokenCount(col("t")), "ab12 cd!") === 4)
  }

  test("punctRatio and stopwordRatio") {
    assert(one[Double](TextFunctions.punctRatio(col("t")), "ab.!") === 0.5)
    assert(one[Double](TextFunctions.stopwordRatio(col("t")), "the cat") === 0.5)
  }

  test("langId picks marker-richest language, und when none") {
    assert(one[String](TextFunctions.langId(col("t")), "the cat and the hat") === "en")
    assert(one[String](TextFunctions.langId(col("t")), "der hund und die katze") === "de")
    assert(one[String](TextFunctions.langId(col("t")), "xyzzy plugh") === "und")
  }

  test("wordShingles builds n-grams; short docs yield empty array") {
    assert(one[Seq[String]](TextFunctions.wordShingles(col("t"), 3), "a b c d") ===
      Seq("a b c", "b c d"))
    assert(one[Seq[String]](TextFunctions.wordShingles(col("t"), 3), "a b") === Seq())
  }

  test("rollingHashFingerprint matches the reference recurrence") {
    // ((7*31 + 'a') * 31 + 'b') % p  for "ab"
    val expected = ((7L * 31 + 'a'.toLong) * 31 + 'b'.toLong) % 2147483647L
    assert(one[Long](TextFunctions.rollingHashFingerprint(col("t")), "ab") === expected)
    assert(one[Long](TextFunctions.rollingHashFingerprint(col("t")), "") === 7L)
  }

  test("native rolling-hash expression equals the HOF formulation") {
    import graft.functions.RollingHashExpression.rollingHash
    for (s <- Seq("", "ab", "the quick brown fox", "héllo wörld"))
      assert(one[Long](rollingHash(col("t")), s) ===
        one[Long](TextFunctions.rollingHashFingerprint(col("t")), s), s"for '$s'")
  }

  test("classEntropy: degenerate, uniform, and empty inputs") {
    def ent(s: String): Double =
      one[Double](TextFunctions.classEntropy(col("t")), s)
    assert(ent("") === 0.0)
    assert(ent("aaaa") === 0.0)          // single class
    assert(ent("1234567890") === 0.0)    // all digits
    // one char of each of the 5 classes: uniform -> log2(5)
    assert(math.abs(ent("aA1 ?") - math.log(5) / math.log(2)) < 1e-12)
    // "aa AA": 2 lower + 2 upper + 1 space over n=5
    def log2(x: Double) = math.log(x) / math.log(2)
    val expected = 2.0 / 5 * log2(5.0 / 2) + 2.0 / 5 * log2(5.0 / 2) +
      1.0 / 5 * log2(5.0)
    assert(math.abs(ent("aa AA") - expected) < 1e-12)
  }

  test("classCount counts alphabet occurrences") {
    assert(one[Long](TextFunctions.classCount(col("t"), "0123456789"),
      "a1b22c333") === 6L)
    assert(one[Long](TextFunctions.classCount(col("t"), " "),
      " x y ") === 3L)
  }
}
