package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING — the tokenizer-building half of
  * the corpus pipeline (the encode half is [[TrainingData]]'s vocab
  * encode). Classic Sennrich BPE over word-frequency counts:
  *
  *  1. ONE pass over the corpus builds the distinct-word frequency
  *     table — the only corpus-sized job; every later round works on
  *     the VOCABULARY (10^5–10^7 rows at any corpus size), which is
  *     what makes BPE training scale-invariant: a 100 TB corpus costs
  *     one word-count shuffle more than a 1 GB one.
  *  2. each merge round counts adjacent symbol pairs weighted by word
  *     frequency, picks the most frequent (ties by pair string — the
  *     deterministic, engine-independent order), and applies the merge
  *     to every word's symbol sequence.
  *
  * Words are lowercased `[a-z]+` runs capped at `maxWordLen`, ended
  * with a `_` end-of-word symbol. Symbol sequences are stored
  * PAREN-WRAPPED — "(l)(o)(w)(_)" — so applying a merge is ONE literal
  * replace of `(a)(b)` with `(ab)`. The wrapping gives every
  * occurrence a left AND right anchor that is never shared with a
  * neighbouring occurrence, which makes left-to-right non-overlapping
  * replacement EXACTLY the greedy BPE fold: a run of 2k identical
  * symbols merges to k in one pass (a space-separated encoding gets
  * this wrong — adjacent matches share their boundary space and every
  * second merge is skipped), and `(xa)(b)` can never false-match
  * `(a)(b)` (a terminator-only encoding gets THAT wrong). The same
  * replace replays literally in the DuckDB oracle, keeping results
  * bit-deterministic across engines.
  *
  * The per-round driver round-trip (argmax collect) is bounded by
  * `nMerges` — the standard structure of every BPE trainer. Only the
  * corpus-sized word-count base is checkpointed; merge rounds compose
  * literal replaces on top of it (a vocabulary-sized expression chain
  * is cheaper to replay than a per-round eager checkpoint job).
  */
object Bpe {

  val EndMark = "_"

  private def pairsOf(seqs: DataFrame): DataFrame =
    seqs
      .withColumn("l", split(trim(col("seq"), "()"), "\\)\\("))
      // a fully-merged single-symbol word contributes no pairs — and
      // Spark's sequence(1, 0) counts DOWN, so it must never reach
      // the transform
      .filter(size(col("l")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(l) - 1), " +
          "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
        .as("pr"))
      .groupBy(col("pr")).agg(sum(col("cnt")).as("n"))

  private def searchOf(pr: String): String =
    "(" + pr.replace(" ", ")(") + ")"
  private def replOf(pr: String): String = "(" + pr.replace(" ", "") + ")"

  /** The learned merge table: (round, pair "a b", n_pairs occurrences
    * at selection time), rounds 1..nMerges in training order.
    */
  def bpeMerges(docs: DataFrame, textCol: String, nMerges: Int,
      maxWordLen: Int = 30): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64, s"nMerges in [1,64], got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    var seqs = words.select(
      concat(regexp_replace(col("word"), "(.)", "($1)"),
        lit("(" + EndMark + ")")).as("seq"),
      col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (round <- 1 to nMerges) {
      val top = pairsOf(seqs)
        .orderBy(col("n").desc, col("pr").asc)
        .limit(1).collect()
      require(top.nonEmpty, s"Bpe: vocabulary exhausted at round $round")
      val pr = top(0).getString(0)
      // NO per-round localCheckpoint: the merge is one literal replace
      // over the VOCABULARY-sized checkpointed base, so letting round i
      // replay the i-deep replace chain costs microseconds of codegen'd
      // string work, while the eager checkpoint it replaces cost a full
      // driver job + RDD serialization per round (measured r18: ~40% of
      // q_bpe_train's build was the 8 checkpoint jobs). The plan depth
      // stays bounded by nMerges <= 64 cheap expressions.
      seqs = seqs.select(
        replace(col("seq"), lit(searchOf(pr)), lit(replOf(pr))).as("seq"),
        col("cnt"))
      merges += ((round, pr, top(0).getLong(1)))
    }
    merges.result().toDF("round", "pair", "n_pairs")
  }

  /** Apply a learned merge table to paren-wrapped symbol sequences
    * (the [[bpeMerges]] representation), merge by merge in training
    * order — the corpus-encode path: one codegen'd replace chain, no
    * driver involvement, no shuffle.
    */
  def applyMerges(df: DataFrame, seqCol: String,
      merges: Seq[String]): DataFrame =
    df.withColumn(seqCol, merges.foldLeft(col(seqCol)) { (acc, pr) =>
      replace(acc, lit(searchOf(pr)), lit(replOf(pr)))
    })

  /** A word column paren-wrapped into the [[bpeMerges]] symbol
    * representation: "low" → "(l)(o)(w)(_)".
    */
  def parenEncode(word: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(regexp_replace(word, "(.)", "($1)"), lit("(" + EndMark + ")"))

  /** Symbol count of a paren-wrapped sequence. */
  def tokenCount(seq: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    size(split(trim(seq, "()"), "\\)\\("))

  /** The DuckDB replay of [[bpeMerges]] — generated from the same
    * constants so the two engines cannot drift: identical word prep,
    * pair counting, (n DESC, pair ASC) selection, and the identical
    * single-replace merge application, as N materialized CTE rounds.
    */
  def oracleSql(nMerges: Int, maxWordLen: Int = 30): String = {
    val parts = Seq.newBuilder[String]
    parts += s"""w0 AS MATERIALIZED (
      SELECT word, count(*) AS cnt FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
        FROM documents) t
      WHERE word <> '' AND length(word) <= $maxWordLen
      GROUP BY word)"""
    parts += s"""s0 AS MATERIALIZED (
      SELECT regexp_replace(word, '(.)', '(\\1)', 'g') || '($EndMark)'
        AS seq, cnt FROM w0)"""
    for (i <- 1 to nMerges) {
      parts += s"""p$i AS MATERIALIZED (
        SELECT l[i] || ' ' || l[i+1] AS pr, sum(cnt) AS n
        FROM (SELECT string_split(trim(seq, '()'), ')(') AS l, cnt
              FROM s${i - 1}),
             UNNEST(range(1, len(l))) AS t(i)
        GROUP BY 1)"""
      parts += s"""m$i AS MATERIALIZED (
        SELECT pr, '(' || replace(pr, ' ', ')(') || ')' AS srch,
               '(' || replace(pr, ' ', '') || ')' AS repl, n
        FROM p$i ORDER BY n DESC, pr ASC LIMIT 1)"""
      parts += s"""s$i AS MATERIALIZED (
        SELECT replace(seq, (SELECT srch FROM m$i), (SELECT repl FROM m$i))
          AS seq, cnt FROM s${i - 1})"""
    }
    val union = (1 to nMerges).map(i =>
      s"SELECT $i AS round, pr AS pair, CAST(n AS BIGINT) AS n_pairs FROM m$i")
      .mkString("\nUNION ALL\n")
    "WITH " + parts.result().mkString(",\n") + "\n" + union +
      "\nORDER BY round"
  }

  /** The DuckDB replay of train-then-encode: the [[oracleSql]] CTE
    * chain learns the merges, then every corpus word occurrence is
    * paren-encoded and run through the SAME replace chain — per-source
    * word and BPE-token counts.
    */
  def encodeOracleSql(nMerges: Int, maxWordLen: Int = 30): String = {
    val train = oracleSql(nMerges, maxWordLen)
    val body = train.substring(0, train.lastIndexOf("\nSELECT 1 AS round"))
      .stripSuffix("\n")
    var r = s"regexp_replace(word, '(.)', '(\\1)', 'g') || '($EndMark)'"
    for (i <- 1 to nMerges)
      r = s"replace($r, (SELECT srch FROM m$i), (SELECT repl FROM m$i))"
    s"""$body,
      corpus AS MATERIALIZED (
        SELECT source, word FROM (
          SELECT source,
                 unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS word
          FROM documents) t
        WHERE word <> '' AND length(word) <= $maxWordLen),
      enc AS MATERIALIZED (
        SELECT source, $r AS seq FROM corpus)
      SELECT source, count(*) AS n_words,
             CAST(sum(len(string_split(trim(seq, '()'), ')('))) AS BIGINT)
               AS n_tokens
      FROM enc GROUP BY source ORDER BY source"""
  }
}
