package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composition a pretraining
  * data pipeline actually runs, as one declarative plan —
  *
  *   1. per-doc stats (chars, tokens, quality, language);
  *   2. quality + length gate;
  *   3. exact dedup (hash group-by, smallest doc_id survives);
  *   4. near-dup removal via LSH candidates → exact-Jaccard confirm
  *      (drop the larger doc_id of each confirmed pair);
  *   5. token accounting for the surviving corpus.
  *
  * Every stage is a narrow transform or a key-partitioned shuffle; the
  * quadratic step touches only LSH candidates. At 100 TB each stage
  * checkpoints to partitioned parquet; here it is one composable plan.
  */
object CorpusPipeline {

  final case class Config(
      minChars: Int = 50,
      minQuality: Double = 0.3,
      langs: Seq[String] = Nil, // empty = keep all
      nearDupShingle: Int = 3,
      nearDupThreshold: Double = 0.6)

  /** Stage 1-2: annotate and gate. */
  def gate(docs: DataFrame, cfg: Config): DataFrame = {
    val annotated = docs.select(
      col("doc_id"), col("text"),
      TextFunctions.charCount(col("text")).as("n_chars_text"),
      TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.langId(col("text")).as("lang_pred"))
    val gated = annotated
      .filter(col("n_chars_text") >= cfg.minChars && col("quality") >= cfg.minQuality)
    if (cfg.langs.isEmpty) gated
    else gated.filter(col("lang_pred").isin(cfg.langs: _*))
  }

  /** Stage 3: exact dedup keeping the smallest doc_id per text hash —
    * the hash-aggregate form (see [[Dedup.exactSurvivors]]: min_by, no
    * sort, duplicates collapse map-side before the shuffle).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    Dedup.exactSurvivors(docs, "text", "doc_id")

  /** Stage 4: near-dup removal — LSH candidates, exact-Jaccard confirm,
    * drop the larger id of each confirmed pair.
    */
  def nearDedup(docs: DataFrame, cfg: Config): DataFrame =
    nearDedupWith(docs, cfg,
      c => Dedup.minhashLshCandidates(c, "text", "doc_id",
        shingleSize = cfg.nearDupShingle),
      (cand, c) => Dedup.jaccardOnCandidates(cand, c, "text", "doc_id",
        cfg.nearDupShingle))

  /** The shared near-dedup tail: persist the corpus once (it feeds LSH
    * candidate generation, the confirm stage's semi-join prune, and the
    * final anti-join — at 100 TB this stage boundary is a parquet
    * checkpoint instead), confirm candidates with exact Jaccard, and
    * anti-join the confirmed drop set — broadcast when it fits, so the
    * corpus is never shuffled end-to-end in this stage. Lifetime note:
    * the returned plan keeps reading the persists, so there is no safe
    * place to unpersist inside the operator; LRU eviction reclaims the
    * blocks (Bench clears the cache per iteration).
    */
  private def nearDedupWith(
      docs: DataFrame,
      cfg: Config,
      candidatesOf: DataFrame => DataFrame,
      confirmOf: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val corpus = docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = candidatesOf(corpus).select(col("id_a"), col("id_b"))
    val confirmed = confirmOf(candidates, corpus)
      .filter(col("jaccard") >= cfg.nearDupThreshold)
      .select(col("id_b").as("drop_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drops =
      if (confirmed.count() <= Dedup.broadcastPairLimit) broadcast(confirmed) else confirmed
    corpus.join(drops, corpus("doc_id") === col("drop_id"), "left_anti")
  }

  /** Full pipeline; returns the surviving corpus with its annotations. */
  def prepare(docs: DataFrame, cfg: Config = Config()): DataFrame =
    nearDedup(exactDedup(gate(docs, cfg)), cfg)

  /** The cross-engine-VERIFIABLE pipeline: the same stages via
    * [[nearDedupWith]], with the md5-variant LSH and the string-shingle
    * confirm, so an ANSI oracle replays gate → exact dedup → LSH →
    * confirm → survivors end-to-end hash-exactly (q_corpus_prep_md5).
    * [[prepare]] (xxhash64 + hashed-shingle confirm) stays the fast path
    * — narrower shuffle keys, same shapes.
    */
  def prepareVerified(docs: DataFrame, cfg: Config = Config()): DataFrame =
    nearDedupWith(exactDedup(gate(docs, cfg)), cfg,
      c => Dedup.minhashLshCandidatesMd5(c, "text", "doc_id",
        shingleSize = cfg.nearDupShingle),
      (cand, c) => Dedup.jaccardOnCandidatesStrings(cand, c, "text", "doc_id",
        cfg.nearDupShingle))

  /** Stage 5: corpus accounting (docs/tokens/chars per predicted lang). */
  def tokenReport(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars_text").cast("bigint")).as("total_chars"))
      .orderBy(col("lang_pred"))
}
