package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the LLM-data-pipeline surface (north-star
  * operators over the `documents` table). All are composed from built-in
  * codegen'd expressions — no Scala UDFs — so they stay inside whole-stage
  * codegen and scale linearly with no shuffle.
  */
object TextFunctions {

  /** Canonical text form for fuzzy-exact dedup: lowercase, ASCII
    * punctuation to spaces, whitespace collapsed, trimmed — so a
    * re-delivered document that differs only in case, punctuation or
    * spacing hashes onto its original (the cheap canonicalization layer
    * every dedup pipeline runs BEFORE the expensive near-dup tiers).
    * Java's `\p{Punct}` and RE2's `[[:punct:]]` are the same ASCII
    * class; whitespace uses an EXPLICIT class because Java's `\s`
    * includes vertical tab while RE2's does not — the one place the two
    * engines' regex dialects would silently diverge.
    */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[\\p{Punct}]", " "),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** SQL twin of [[canonicalText]] over a DuckDB expression. */
  def canonicalTextSql(expr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($expr), " +
      "'[[:punct:]]', ' ', 'g'), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"

  private val lowerChars = "abcdefghijklmnopqrstuvwxyz"
  private val upperChars = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val digitChars = "0123456789"

  /** Character-CLASS counts of a text column — (lower, upper, digit,
    * space, other) — via `length - length(translate(...))`, so the whole
    * computation is three codegen'd string scans and never explodes a
    * character array. The building block of [[classEntropy]].
    */
  def classCount(c: Column, chars: String): Column =
    (length(c) - length(translate(c, chars, ""))).cast("bigint")

  /** Shannon entropy (bits) of the character-CLASS distribution of a
    * text column: lower/upper/digit/space/other. Low entropy flags
    * degenerate documents (all digits, all caps, single-class filler) —
    * a standard cheap quality gate next to length/stopword ratios.
    *
    * Float parity: each class term `-(p)·log2(p)` is a fixed expression
    * over exact integer counts, and the five terms are added in ONE
    * fixed written order (never a data-dependent aggregation), so the
    * only cross-engine wobble is the final libm `log2` ulp — callers
    * round to 6 decimals like the cosine family.
    */
  def classEntropy(c: Column): Column = {
    val n = length(c).cast("double")
    val counts = Seq(
      classCount(c, lowerChars),
      classCount(c, upperChars),
      classCount(c, digitChars),
      classCount(c, " "))
    val other = length(c).cast("bigint") - counts.reduce(_ + _)
    def term(cnt: Column): Column =
      when(cnt > 0, (cnt.cast("double") / n) * log2(n / cnt.cast("double")))
        .otherwise(lit(0.0))
    when(length(c) === 0, lit(0.0))
      .otherwise((counts :+ other).map(term).reduce(_ + _))
  }

  /** SQL twin of [[classEntropy]] over a DuckDB expression — same class
    * alphabets, same term shape, same left-to-right addition order.
    */
  def classEntropySql(expr: String): String = {
    def cnt(chars: String): String =
      s"(length($expr) - length(translate($expr, '$chars', '')))"
    val counts = Seq(cnt(lowerChars), cnt(upperChars), cnt(digitChars),
      cnt(" "))
    val other = s"(length($expr) - (${counts.mkString(" + ")}))"
    def term(c: String): String =
      s"(CASE WHEN $c > 0 THEN (CAST($c AS DOUBLE) / length($expr)) * " +
        s"log2(CAST(length($expr) AS DOUBLE) / $c) ELSE 0.0 END)"
    s"(CASE WHEN length($expr) = 0 THEN 0.0 ELSE " +
      s"${(counts :+ other).map(term).mkString(" + ")} END)"
  }

  /** Whitespace token count. `split` on empty string yields one empty
    * token in both Spark and ANSI SQL — callers on possibly-empty text
    * should guard with `when(length(c) === 0, 0)`.
    */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword-shaped token count: runs of letters, runs of digits,
    * or single non-space symbols — a cheap deterministic proxy for a real
    * tokenizer's token count.
    */
  def bpeishTokenCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  def charCount(c: Column): Column = length(c)

  /** Ratio of punctuation characters to total characters (quality signal).
    * Counted as `length - length(translate(...))` — the same count the
    * regex `[.,;:!?]` gives, at plain-char-scan cost instead of regex-
    * engine cost (this sits on the corpus-gate hot path).
    */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise((length(c) - length(translate(c, ".,;:!?", ""))).cast("double") / length(c))

  /** Ratio of tokens that are English stopwords (quality signal). */
  val enStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordHits(c: Column, words: Seq[String]): Column =
    regexp_count(c, lit(words.mkString("\\b(", "|", ")\\b")))

  def stopwordRatio(c: Column): Column = {
    val toks = tokenCount(c)
    when(toks === 0, lit(0.0)).otherwise(stopwordHits(c, enStopwords).cast("double") / toks)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation density and some stopword mass (boilerplate-vs-prose
    * heuristic used by pretraining-data filters).
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val punct = punctRatio(c)
    val stop = stopwordRatio(c)
    round(lenScore * 0.5 + (lit(1.0) - least(punct * 10, lit(1.0))) * 0.25 +
      least(stop * 5, lit(1.0)) * 0.25, 6)
  }

  /** n-gram-heuristic language ID: count stopword hits per candidate
    * language, argmax wins (ties broken by fixed language order). Purely
    * codegen'd — one regexp_count per language.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
  )

  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, words) => (lang, stopwordHits(c, words)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val firstMatch = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lit(lang)).otherwise(acc)
    }
    firstMatch
  }

  /** Deterministic 64-bit document fingerprint: polynomial rolling hash of
    * the UTF-8 text, computed with the `aggregate` higher-order function —
    * distributed, no UDF, and oracle-expressible (DuckDB `list_reduce`).
    * Uses mod 2^31-1 to stay in exactly-representable integer range for
    * cross-engine parity.
    */
  def rollingHashFingerprint(c: Column): Column =
    aggregate(
      // Java split keeps a trailing "" element; drop empties for parity
      // with DuckDB's string_split(text, '') character list.
      filter(split(c, ""), ch => length(ch) > 0),
      lit(7L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(2147483647L)))

  /** Deterministic split bucket in [0, buckets): md5 of the column's
    * content, first 8 hex digits as an integer, mod buckets. Content
    * hashing (not rand/row position) makes the assignment stable across
    * runs, partitionings, and engines — the property a train/val/test
    * split must have so no example ever migrates between splits when the
    * corpus is re-processed. md5 (not xxhash64) keeps it oracle-
    * replayable in ANSI SQL.
    */
  def splitBucket(c: Column, buckets: Int): Column =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))

  /** Word n-gram shingles of a text column: array of space-joined n-grams
    * over whitespace tokens. Empty/short docs yield an empty array.
    *
    * The token array is BOUND ONCE through a single-element `transform`:
    * higher-order functions are interpreted (CodegenFallback) and
    * re-evaluate outer subexpressions on EVERY lambda invocation, so
    * referencing the `split` directly inside the per-shingle lambda
    * re-ran the whitespace regex ~3×shingles times per row (measured
    * ~1.8 ms/doc → ~9 s just to shingle a 5k-doc corpus); binding it as
    * a lambda variable makes each `element_at` an O(1) index.
    */
  def wordShingles(c: Column, n: Int): Column =
    transform(array(split(trim(c), "\\s+")), toks => {
      val count = size(toks) - (n - 1)
      when(count <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), count - 1), i =>
          concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*)))
    }).getItem(0)
}
