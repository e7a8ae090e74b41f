package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Baseline: brute-force cosine top-k — a single narrow projection plus a
  * TakeOrderedAndProject; correct at any scale but O(n) per query.
  * Scale path: sign-LSH bucketing — partition the corpus by a k-bit
  * random-hyperplane sketch, probe only the query's bucket. The bucket
  * column is also the right parquet partition key for a 100 TB corpus, so
  * a probe prunes to one partition before any scan.
  */
object Similarity {

  /** Brute-force cosine top-k against a literal query vector. Uses the
    * native codegen'd [[graft.functions.CosineExpression]] (single fused
    * loop per row) — the HOF formulation is ~3× slower per row; their
    * equivalence is pinned in SimilaritySpec.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      queryVec: Seq[Double],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = typedLit(queryVec.map(_.toFloat))
    embeddings
      .select(col(idCol),
        round(graft.functions.CosineExpression.cosine(col(vecCol), q), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Brute-force cosine top-k against a ONE-ROW query frame. The query
    * vector rides a broadcast cross join instead of a driver-side
    * `.head()` fetch, so building the plan launches no eager job and the
    * operator composes lazily like everything else (the same pattern as
    * the Scd2 broadcast max-key frame).
    */
  def bruteForceTopKDf(
      corpus: DataFrame,
      queryDf: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queryDf.select(col(vecCol).as("_graft_qvec"))
    corpus
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(graft.functions.CosineExpression.cosine(col(vecCol), col("_graft_qvec")), 6)
          .as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Top-k for every query row of `queries` against `corpus` — window
    * row_number per query over the bucketed candidate join.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = VectorFunctions.hyperplanes(numPlanes, dim)
    val sb = graft.functions.SignBucketExpression.signBucket(_: org.apache.spark.sql.Column, planes)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      sb(col(vecCol)).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      sb(col(vecCol)).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine_sim",
        round(graft.functions.CosineExpression.cosine(col("qvec"), col("cvec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine_sim"), col("rk"))
  }
}
