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
}
