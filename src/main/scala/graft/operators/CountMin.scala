package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — the fixed-memory frequency
  * summary for heavy-hitter mining at corpus scale.
  *
  * `depth` hash rows × `width` counters; every token increments one
  * counter per row (hash = salted content-hash), and a token's estimate
  * is the MINIMUM of its `depth` counters — an overestimate by
  * construction (collisions only ever add), within εN with probability
  * 1-δ for width = e/ε, depth = ln(1/δ).
  *
  * Scale shape: the sketch is `depth × width` cells REGARDLESS of corpus
  * size — the groupBy aggregates map-side into at most that many rows,
  * and the estimate join broadcasts the finished sketch. That is the
  * whole point at 100 TB: exact per-token counts need a corpus-wide
  * shuffle of every distinct token, the sketch never shuffles more than
  * `depth·width` rows.
  *
  * Hashes are the md5-prefix [[TF.splitBucket]] with a per-row salt
  * (never xxhash64), so DuckDB replays the sketch cell-for-cell and the
  * catalog query (q_heavy_hitters) is hash-oracled, not rows-only.
  */
object CountMin {

  private def saltedBucket(tok: org.apache.spark.sql.Column, row: Int,
      width: Int) =
    TF.splitBucket(concat_ws("", lit(s"cms$row"), tok), width)

  /** Exploded token stream `(tok)` of a document table — shared by the
    * sketch build and the exact-count verifier so tokenization cannot
    * drift between them.
    */
  def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("tok"))

  /** Build the sketch: one `(h, bucket, cnt)` row per non-empty cell
    * (at most depth × width rows whatever the input size).
    */
  def sketch(toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks.select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("h"), saltedBucket(col("tok"), r, width).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.h").as("h"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for a set of distinct tokens against a built
    * sketch: min over the token's depth cells. The sketch side is tiny
    * and broadcast; the token side never shuffles.
    */
  def estimates(sk: DataFrame, distinctToks: DataFrame, depth: Int,
      width: Int): DataFrame =
    distinctToks.select(col("tok"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("h"), saltedBucket(col("tok"), r, width).as("bucket"))): _*))
          .as("rb"))
      .join(broadcast(sk),
        col("rb.h") === col("h") && col("rb.bucket") === col("bucket"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("est"))

  /** Heavy hitters end-to-end: tokens whose sketch estimate reaches
    * total/`fractionDenom`, reported with their exact count (est >=
    * exact always; CountMinSpec pins the overestimate invariant). The
    * threshold rides a broadcast one-row aggregate — integer arithmetic,
    * oracle-replayable.
    */
  def heavyHitters(docs: DataFrame, textCol: String = "text",
      depth: Int = 4, width: Int = 256,
      fractionDenom: Long = 50L): DataFrame = {
    val toks = tokens(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sk = sketch(toks, depth, width)
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val thr = toks.agg((count(lit(1)) / fractionDenom).cast("long").as("thr"))
    estimates(sk, exact.select(col("tok")), depth, width)
      .join(exact, Seq("tok"))
      .crossJoin(broadcast(thr))
      .filter(col("est") >= col("thr"))
      .select(col("tok"), col("est"), col("n_exact"))
  }
}
