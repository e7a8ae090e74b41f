package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index keyword search over a document corpus — the retrieval
  * primitive a curation/RAG pipeline uses to pull candidate documents by
  * content without scanning text.
  *
  * The index is posting rows `(token, doc_id, tf)` — the relational
  * representation that scales: posting lists shuffle and store by TOKEN
  * (bucket/bloom-prunable when committed through
  * [[graft.sources.Snapshots]] with `token` stats), and a query's cost
  * is proportional to the queried terms' posting lists, never the
  * corpus. Postings are append-only over new documents (a doc's tokens
  * never change retroactively), so index maintenance is a delta append
  * plus rollup-sized df/N re-aggregation — the incremental-state
  * discipline of the rest of the maintenance tier.
  *
  * Ranking is BM25-SHAPED but INTEGER-EXACT: a saturating
  * term-frequency weight times a df-damped rarity weight, both computed
  * with integer division only (the TF-IDF/bigram-LM discipline — no
  * log, no float accumulation, so engine and oracle agree bit-for-bit
  * and results are partitioning-independent):
  *
  *   rarity(t) = (S1 * (N - df(t) + 1)) div (N + 1)   — falls with df
  *   satTf(tf) = (S2 * tf) div (tf + K)               — saturates in tf
  *   score(d)  = Σ_t  rarity(t) * satTf(tf(t,d))
  */
object InvertedIndex {

  /** The index state: one posting row per (token, document) with its
    * term frequency. Tokenization = the corpus-wide whitespace split
    * every text operator shares (vocabStats, TF-IDF, bigram LM).
    */
  def postings(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive (AND) search: ids of documents containing EVERY query
    * term. The term filter reaches the postings scan (an IN over a
    * literal set — file-skippable via token stats/blooms on a stored
    * index), then one aggregation over only those posting lists.
    */
  def searchAll(post: DataFrame, terms: Seq[String]): DataFrame = {
    val t = terms.distinct
    require(t.nonEmpty, "searchAll needs at least one term")
    post.filter(col("token").isin(t: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === t.size)
      .select(col("doc_id"))
  }

  /** AND-search + integer BM25-shaped ranking, top-k by (score desc,
    * doc_id). `totals` is a 1-row (n_docs) frame so N never crosses the
    * driver. df is computed from the FILTERED postings — identical to
    * the full-corpus df for those tokens (a token's filtered posting
    * list is its whole posting list) at term-list cost.
    */
  def rankedSearch(post: DataFrame, totals: DataFrame, terms: Seq[String],
      k: Int = 2, topK: Int = 10, s1: Long = 1000000L, s2: Long = 1000L)
      : DataFrame = {
    val t = terms.distinct
    require(t.nonEmpty, "rankedSearch needs at least one term")
    require(k >= 1 && topK >= 1, s"need k,topK >= 1, got $k,$topK")
    val filtered = post.filter(col("token").isin(t: _*))
    val dfs = filtered.groupBy(col("token"))
      .agg(count_distinct(col("doc_id")).as("df"))
    filtered.join(broadcast(dfs), "token")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        (expr(s"($s1 * (n_docs - df + 1)) div (n_docs + 1)") *
          expr(s"($s2 * tf) div (tf + $k)")).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === t.size)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }
}
