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
    *
    * Built from the EXACT COUNTS this query needs anyway, not from the
    * raw occurrence stream: a sketch cell's count is the count of
    * occurrences hashing into it, i.e. the SUM of `n_exact` over the
    * tokens hashing into it — identical cell values, but the depth md5
    * hashes are computed once per DISTINCT token instead of once per
    * occurrence, and the `(tok, h, bucket)` rows are computed ONCE and
    * feed both the cell aggregation and the min-read (the previous
    * shape hashed the stream for the sketch and the distinct tokens
    * again for the estimates — ~4 x corpus-token md5 calls vs
    * ~4 x vocabulary now). The standalone [[sketch]] keeps the
    * stream shape for callers without exact counts (the streaming
    * sketch fold).
    */
  def heavyHitters(docs: DataFrame, textCol: String = "text",
      depth: Int = 4, width: Int = 256,
      fractionDenom: Long = 50L): DataFrame = {
    val exact = tokens(docs, textCol)
      .groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rb = exact.select(col("tok"), col("n_exact"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("h"), saltedBucket(col("tok"), r, width).as("bucket"))): _*))
          .as("rb"))
      .select(col("tok"), col("n_exact"),
        col("rb.h").as("h"), col("rb.bucket").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sk = rb.groupBy(col("h"), col("bucket"))
      .agg(sum(col("n_exact")).as("cnt"))
    val thr = exact.agg((sum(col("n_exact")) / fractionDenom)
      .cast("long").as("thr"))
    rb.join(broadcast(sk), Seq("h", "bucket"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("est"),
        min(col("n_exact")).as("n_exact"))
      .crossJoin(broadcast(thr))
      .filter(col("est") >= col("thr"))
      .select(col("tok"), col("est"), col("n_exact"))
  }
}
