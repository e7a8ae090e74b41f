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

  /** HARD-NEGATIVE MINING for contrastive training: for every query
    * vector, the top-k most-similar corpus vectors carrying a DIFFERENT
    * label — the negatives closest to the decision boundary, the pairs
    * a contrastive loss learns most from. Exact brute scan with the
    * query frame broadcast: the corpus (the 100 TB side) never
    * shuffles — candidates and the per-query top-k window form
    * map-side-first (one shuffle on query_id, bounded by |queries|·|k|
    * semantics). The label inequality makes this a broadcast
    * nested-loop join by construction — correct for probe-sized query
    * frames; at full-corpus query scale, generate candidates with
    * [[lshTopK]]/IVF instead and keep the same label filter + window.
    * NULL-labeled rows never match (SQL inequality), on both sides.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_graft_qvec"), col(labelCol).as("_graft_qlabel")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col(idCol))
    corpus.join(q, col(labelCol) =!= col("_graft_qlabel") &&
        col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        round(graft.functions.CosineExpression.cosine(col(vecCol),
          col("_graft_qvec")), 6).as("cosine_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Top-k for every query row of `queries` against `corpus` — window
    * row_number per query over the bucketed candidate join. With
    * `broadcastQueries` the query frame is broadcast and the corpus (the
    * 100 TB side) never shuffles — candidates form map-side. The default
    * leaves the join to the planner (AQE + autoBroadcastJoinThreshold
    * still broadcast a provably-small side): an unconditional hint would
    * bypass the size safety valve and OOM on a corpus-scale query frame.
    * Callers that KNOW the query frame is small (the probe shape) pass
    * `broadcastQueries = true`. `excludeSelf` assumes queries and corpus
    * share one id space (the self-probe shape); pass false when the id
    * spaces are independent, or coinciding ids silently lose their top
    * candidate.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = false,
      excludeSelf: Boolean = true): DataFrame = {
    val planes = VectorFunctions.hyperplanes(numPlanes, dim)
    val sb = graft.functions.SignBucketExpression.signBucket(_: org.apache.spark.sql.Column, planes)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
      sb(col(vecCol)).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      sb(col(vecCol)).as("bucket"))
    bucketProbe(c, q, k, broadcastQueries, excludeSelf)
  }

  /** The shared probe core: bucket equi-join, exact cosine on candidates,
    * per-query top-k window. `c` = (corpus_id, cvec, bucket), `q` =
    * (query_id, qvec, bucket). The query side broadcasts only when the
    * caller asserts it is small via `broadcastQueries` (the probe shape:
    * few queries against a huge corpus — the corpus never shuffles);
    * otherwise the planner picks, so a corpus-scale query frame falls
    * back to a shuffle join instead of a forced giant broadcast.
    * `excludeSelf` drops query_id == corpus_id candidates — correct only
    * when both frames share one id space (self-probes).
    */
  private def bucketProbe(
      c: DataFrame, q: DataFrame, k: Int,
      broadcastQueries: Boolean, excludeSelf: Boolean): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    val candidates = c.join(if (broadcastQueries) broadcast(q) else q, Seq("bucket"))
    (if (excludeSelf) candidates.filter(col("query_id") =!= col("corpus_id"))
     else candidates)
      .withColumn("cosine_sim",
        round(graft.functions.CosineExpression.cosine(col("qvec"), col("cvec")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine_sim"), col("rk"))
  }

  /** Embedding-cosine near-dup, exact form: every pair (id_a < id_b) with
    * cosine >= threshold. O(n²) pair space — the ground-truth verifier,
    * meant for bounded subsets (the oracled catalog query runs it on a 20%
    * sample); the production path is [[cosineNearDupLsh]].
    */
  def cosinePairsBrute(
      df: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("_va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        round(graft.functions.CosineExpression.cosine(col("_va"), col("_vb")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
  }

  /** Embedding-cosine near-dup, scale path: sign-LSH bucket the vectors,
    * self-join within buckets only, exact-cosine confirm on candidates —
    * the same candidates-then-confirm shape as MinHash+LSH text dedup.
    * Fewer planes than the ANN probe (recall over precision: a near-dup
    * pair survives bucketing with probability (1 - θ/π)^numPlanes, so a
    * threshold-style filter wants a coarse sketch). Approximate by
    * construction — pairs split across buckets are missed; recall what the
    * brute verifier measures.
    */
  def cosineNearDupLsh(
      df: DataFrame,
      threshold: Double,
      numPlanes: Int = 4,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val planes = VectorFunctions.hyperplanes(numPlanes, dim)
    val bucketed = df.select(col(idCol), col(vecCol),
      graft.functions.SignBucketExpression.signBucket(col(vecCol), planes).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("_va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("_vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim",
        round(graft.functions.CosineExpression.cosine(col("_va"), col("_vb")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
  }

  /** IVF-style ANN: a coarse quantizer over deterministically sampled
    * centroids (the nCentroids smallest-id corpus vectors). Index build
    * assigns every corpus vector to its nearest centroid ENTIRELY
    * map-side — the centroid list rides a one-row broadcast and the
    * argmax is an array expression, so the corpus never shuffles for the
    * build. A probe fans each query out to its nProbe nearest centroids
    * and runs the exact-cosine top-k over those inverted lists only.
    * With nProbe = nCentroids the search is exhaustive and equals brute
    * force (SimilaritySpec pins it); smaller nProbe trades recall for a
    * ~nProbe/nCentroids-scale candidate set. Complements the sign-LSH
    * path: IVF adapts to the data's actual clustering, LSH needs no
    * index pass.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = false,
      excludeSelf: Boolean = true): DataFrame = {
    val centroids = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
    ivfProbe(centroids, corpus, queries, k, nProbe, idCol, vecCol,
      broadcastQueries, excludeSelf)
  }

  /** The shared IVF probe against an explicit `(cent_id, centv)` centroid
    * frame (seeded — [[ivfTopK]] — or Lloyd's-trained —
    * [[ivfTopKTrained]]): centroids collapse to a one-row broadcast, the
    * corpus assigns map-side to its argmax-cosine centroid (ties to the
    * larger cent_id — the reverse of the ascending (sim, cent_id) struct
    * sort), queries fan out to their nProbe nearest lists, and
    * [[bucketProbe]] runs the exact-cosine top-k.
    */
  private def ivfProbe(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int,
      idCol: String,
      vecCol: String,
      broadcastQueries: Boolean,
      excludeSelf: Boolean): DataFrame = {
    val cents = centroids
      .agg(collect_list(struct(col("cent_id"), col("centv"))).as("_cents"))
    // nearest-n centroids of the current row's vector, best first —
    // (sim, cent_id) structs sorted by natural struct order, reversed
    def nearest(n: Int): org.apache.spark.sql.Column =
      slice(reverse(array_sort(transform(col("_cents"), c =>
        struct(
          graft.functions.CosineExpression.cosine(col(vecCol), c.getField("centv")).as("sim"),
          c.getField("cent_id").as("cent_id"))))), 1, n)
    val c = corpus.crossJoin(broadcast(cents))
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
        element_at(nearest(1), 1).getField("cent_id").as("bucket"))
    val q = queries.crossJoin(broadcast(cents))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(nearest(nProbe).getField("cent_id")).as("bucket"))
    bucketProbe(c, q, k, broadcastQueries, excludeSelf)
  }

  /** Lloyd's-refined IVF centroids: start from the deterministic
    * smallest-id seeds and run `iters` k-means iterations — assign every
    * vector to its argmax-cosine centroid (ties to the larger cent_id,
    * the [[ivfTopK]] rule), then recenter each cluster on its
    * per-dimension mean. A real 100 TB ANN index trains its coarse
    * quantizer; this is that step, under the engine's iterative-FP
    * discipline (the PageRank pattern) tightened one notch so even the
    * CENTROIDS are bit-stable cross-engine:
    *
    *   - each component is quantized to an exact integer
    *     (`round(x * 1e6)` — IEEE multiply + HALF-UP round, bit-identical
    *     across engines) before the cluster sum, so the mean is
    *     `exact-integer-sum / n / 1e6` — two correctly-rounded IEEE
    *     divisions, NOT a double→decimal cast (which drifts 1 ulp between
    *     engines and would poison every downstream argmax);
    *   - sums ride `decimal(38,0)` so accumulation order cannot matter at
    *     any partitioning (ANSI long sums would also overflow first);
    *   - empty clusters keep their previous centroid.
    *
    * Each iteration is one map-side assignment (broadcast centroid list)
    * + one (cent_id, pos)-keyed aggregation — at 100 TB the corpus never
    * shuffles by itself, only the nCentroids×dim summary does. Each
    * round's tiny centroid frame is checkpointed so the unrolled loop
    * doesn't compound nested broadcasts into one mega-plan.
    */
  def trainIvfCentroids(
      corpus: DataFrame,
      nCentroids: Int = 16,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      quantScale: Double = 1000000.0): DataFrame = {
    var cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"),
        transform(col(vecCol), x => x.cast("double")).as("centv"))
      // nCentroids x dim is index METADATA — single partition, so the
      // eager checkpoint and every later broadcast cost one task
      .coalesce(1).localCheckpoint()
    for (_ <- 1 to iters) {
      val centsRow = cents
        .agg(collect_list(struct(col("cent_id"), col("centv"))).as("_cents"))
      val nearest1 = element_at(slice(reverse(array_sort(
        transform(col("_cents"), c => struct(
          graft.functions.CosineExpression.cosine(col(vecCol), c.getField("centv"))
            .as("sim"),
          c.getField("cent_id").as("cent_id"))))), 1, 1), 1)
        .getField("cent_id")
      val assigned = corpus.crossJoin(broadcast(centsRow))
        .select(nearest1.as("cent_id"), col(vecCol).as("_v"))
      val means = assigned
        .select(col("cent_id"), posexplode(col("_v")).as(Seq("pos", "x")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(sum(round(col("x").cast("double") * quantScale)
            .cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
        .select(col("cent_id"), col("pos"),
          (col("s").cast("double") / col("n") / quantScale).as("m"))
      val updated = means.groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("_new"))
      // lazy persist instead of a per-round eager checkpoint: the round
      // still computes exactly once (the cache serializes its two
      // consumers — next round's broadcast build and the carry join) but
      // the corpus-wide assignment+mean pass now rides the final action
      // instead of running as a separate build-time job per round (the
      // IVF-PQ encode lesson, r18). The static plan nests ~2^iters copies
      // of the tiny seed subtree before cache substitution, which is
      // bounded for any sane iteration count; the frames themselves stay
      // nCentroids x dim.
      cents = cents
        .join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"),
          coalesce(col("_new"), col("centv")).as("centv"))
        .coalesce(1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    cents
  }

  /** [[ivfTopK]] with a Lloyd's-trained coarse quantizer
    * ([[trainIvfCentroids]]): the honest IVF story — train, assign,
    * probe. SimilaritySpec pins that training does not lose recall vs the
    * untrained seeds on the fixture corpus and that `iters = 0`
    * degenerates to (double-promoted) untrained IVF.
    */
  def ivfTopKTrained(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      iters: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = false,
      excludeSelf: Boolean = true): DataFrame = {
    val centroids = trainIvfCentroids(corpus, nCentroids, iters, idCol, vecCol)
    ivfProbe(centroids, corpus, queries, k, nProbe, idCol, vecCol,
      broadcastQueries, excludeSelf)
  }

  /** Left-to-right squared-L2 distance between two `array<double>`
    * columns: `aggregate` folds sequentially from 0.0, so the result is
    * bit-identical to any sequential replay (DuckDB `list_sum` over the
    * zipped squares) — exactness matters because PQ argmin assignments
    * ride on it and a 1-ulp flip would cascade into different codebooks.
    */
  private def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e)

  /** Product-quantization codebooks over residual subvectors — the PQ
    * half of IVF-PQ ([[ivfPqTopK]]). Input: one row per (vec_id, sub)
    * with the `array<double>` subvector; output: (sub, code, centv), ksub
    * entries per subspace.
    *
    * Training is k-means per subspace under the same bit-stable
    * discipline as [[trainIvfCentroids]]: seeds are the `ksub`
    * smallest-vec_id subvectors (code = rank of the seed id); assignment
    * is squared-L2 argmin with ties to the SMALLER code (ascending
    * (dist, code) struct sort — note the opposite tie direction from the
    * coarse quantizer's cosine argmax, where descending sim reverses the
    * struct order); recentering quantizes each component to
    * `round(x * 1e6)` and sums in decimal(38,0), so centroids are
    * bit-identical across engines and partitionings. Empty codes keep
    * their previous centroid.
    *
    * Scale: all m subspaces train in the SAME dataframe pass — one
    * broadcast of the m×ksub codebook, one (sub, code, pos)-keyed
    * partial-aggregated shuffle per iteration. The corpus itself never
    * shuffles.
    */
  def trainPqCodebooks(
      residualSubs: DataFrame,
      ksub: Int = 16,
      iters: Int = 1,
      quantScale: Double = 1000000.0): DataFrame = {
    val seedIds = residualSubs.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(ksub)
      .withColumn("code",
        row_number().over(Window.orderBy(col("vec_id"))) - 1)
    var cb = residualSubs.join(broadcast(seedIds), "vec_id")
      .select(col("sub"), col("code"), col("subv").as("centv"))
      // m x ksub codebook rows — same single-partition treatment as the
      // coarse centroid frame
      .coalesce(1).localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = assignPqCodes(residualSubs, cb)
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("subv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(round(col("x") * quantScale).cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code"), col("pos"),
          (col("s").cast("double") / col("n") / quantScale).as("m"))
      val updated = means.groupBy(col("sub"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("_new"))
      // lazy persist, not an eager checkpoint — same reasoning as
      // [[trainIvfCentroids]]'s round carry.
      cb = cb.join(updated, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("_new"), col("centv")).as("centv"))
        .coalesce(1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    cb
  }

  /** Encode every (vec_id, sub, subv) row against a codebook: squared-L2
    * argmin, ties to the smaller code. Map-side — the m×ksub codebook
    * broadcasts, the corpus stays put.
    */
  private def assignPqCodes(subs: DataFrame, cb: DataFrame): DataFrame = {
    val cbRow = cb.groupBy(col("sub"))
      .agg(collect_list(struct(col("code"), col("centv"))).as("_cb"))
    val best = element_at(array_sort(transform(col("_cb"), c =>
      struct(l2sq(col("subv"), c.getField("centv")).as("dist"),
        c.getField("code").as("code")))), 1).getField("code")
    subs.join(broadcast(cbRow), "sub")
      .select(col("vec_id"), col("sub"), col("subv"), best.as("code"))
  }

  /** IVF-PQ: the coarse quantizer prunes the candidate lists
    * ([[ivfTopK]]'s seeded assignment) and product quantization
    * compresses what is stored per candidate — `m` codes of
    * log2(ksub) bits instead of `dim` floats, the memory story that
    * makes a 100 TB ANN index fit its serving tier. Scoring is
    * reconstruction-based: candidate ≈ coarse centroid + concatenated
    * codebook entries for its codes, scored by exact cosine against the
    * raw query vector — so the whole chain (coarse assign, residual,
    * codebook training, encode, reconstruct, probe) is deterministic and
    * replays hash-exact in DuckDB. Accuracy is bounded by quantization
    * error; SimilaritySpec pins recall against brute force and that
    * ksub = corpus size with 0 training recovers plain IVF ordering.
    *
    * Output: (query_id, corpus_id, approx_sim, rk) — `approx_sim` is the
    * cosine against the RECONSTRUCTION, not the raw corpus vector.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 1,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = false,
      excludeSelf: Boolean = true,
      train: Option[DataFrame] = None): DataFrame = {
    val ix = buildPqIndex(corpus, nCentroids, m, ksub, iters, dim, idCol,
      vecCol, train)
    // reconstruct: coarse centroid + concatenated codebook entries (the
    // m×ksub codebook is broadcast-joined twice; the corpus is touched
    // once per step, never shuffled by itself)
    val recon = assignPqCodes(ix.subs, ix.codebooks)
      .join(broadcast(ix.codebooks), Seq("sub", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("centv")))),
        s => s.getField("centv"))).as("_pqres"))
      .join(ix.asgn.select(col("vec_id"), col("cent_id"), col("centv")), "vec_id")
      .select(col("vec_id"), col("cent_id"),
        zip_with(col("centv"), col("_pqres"), (x, y) => x + y).as("_recon"))
    val c = recon.select(col("vec_id").as("corpus_id"),
      col("_recon").as("cvec"), col("cent_id").as("bucket"))
    val q = queryBuckets(ix.centroids, queries, nProbe, idCol, vecCol)
    bucketProbe(c, q, k, broadcastQueries, excludeSelf)
      .withColumnRenamed("cosine_sim", "approx_sim")
  }

  /** The shared IVF-PQ index build: seeded coarse quantizer, map-side
    * assignment + residuals, m contiguous subvectors, trained codebooks.
    */
  private case class PqIndex(centroids: DataFrame, asgn: DataFrame,
      subs: DataFrame, codebooks: DataFrame)

  private def buildPqIndex(corpus: DataFrame, nCentroids: Int, m: Int,
      ksub: Int, iters: Int, dim: Int, idCol: String, vecCol: String,
      train: Option[DataFrame] = None): PqIndex = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m subspaces")
    val dsub = dim / m
    // training set (coarse centroids + codebooks) may be a SUBSET of the
    // corpus — nobody runs k-means over 100 TB; encoding still covers
    // every corpus vector
    val centroids = train.getOrElse(corpus).orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"),
        transform(col(vecCol), x => x.cast("double")).as("centv"))
      // nCentroids x dim is index METADATA — single partition, so the
      // eager checkpoint and every later broadcast cost one task
      .coalesce(1).localCheckpoint()
    val (asgn, subs) = encodeAgainst(corpus, centroids, m, dsub, idCol, vecCol)
    val trainSubs = train match {
      case None => subs
      case Some(t) =>
        subs.join(t.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_semi")
    }
    PqIndex(centroids, asgn, subs, trainPqCodebooks(trainSubs, ksub, iters))
  }

  /** Coarse-assign `corpus` to its nearest stored centroid and split the
    * residual into m subvectors — the encode path shared by the initial
    * index build and [[appendToPqIndex]] (which runs it against the
    * centroids READ BACK from a stored index, so the two cannot drift).
    */
  private def encodeAgainst(corpus: DataFrame, centroids: DataFrame,
      m: Int, dsub: Int, idCol: String, vecCol: String)
      : (DataFrame, DataFrame) = {
    val cents = centroids
      .agg(collect_list(struct(col("cent_id"), col("centv"))).as("_cents"))
    val nearest1 = element_at(slice(reverse(array_sort(
      transform(col("_cents"), c => struct(
        graft.functions.CosineExpression.cosine(col(vecCol), c.getField("centv")).as("sim"),
        c.getField("cent_id").as("cent_id"))))), 1, 1), 1).getField("cent_id")
    // coarse assignment + residual, map-side; persisted — it feeds the
    // subvector explosion AND the final reconstruction join, and each
    // recompute re-runs the 16-cosine scan of the corpus
    val asgn = corpus.crossJoin(broadcast(cents))
      .select(col(idCol).as("vec_id"), col(vecCol).as("_emb"),
        nearest1.as("cent_id"))
      .join(broadcast(centroids), "cent_id")
      .withColumn("resid",
        zip_with(col("_emb"), col("centv"), (x, y) => x.cast("double") - y))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // m contiguous subvectors per vector. Persist (lazy), NOT an eager
    // localCheckpoint: the frame feeds codebook training and the final
    // encode, but materializing a corpus-sized RDD copy up front costs a
    // full extra job + storage write of the whole explosion; the cache
    // fills on first use and lineage stays shallow (one map-side stage),
    // so the unrolled training loop cannot compound through it — cb is
    // checkpointed per iteration, subs' plan is constant.
    val subs = asgn.select(col("vec_id"),
        explode(array((0 until m).map(si => struct(lit(si).as("sub"),
          slice(col("resid"), si * dsub + 1, dsub).as("subv"))): _*)).as("sv"))
      .select(col("vec_id"), col("sv.sub").as("sub"), col("sv.subv").as("subv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (asgn, subs)
  }

  /** Query-side nProbe bucket fan-out against a centroid frame — shared
    * by the in-memory and stored-index probes so the two cannot drift.
    */
  private def queryBuckets(centroids: DataFrame, queries: DataFrame,
      nProbe: Int, idCol: String, vecCol: String): DataFrame = {
    val cents = centroids
      .agg(collect_list(struct(col("cent_id"), col("centv"))).as("_cents"))
    val nearestN = slice(reverse(array_sort(transform(col("_cents"), c =>
      struct(
        graft.functions.CosineExpression.cosine(col(vecCol), c.getField("centv")).as("sim"),
        c.getField("cent_id").as("cent_id"))))), 1, nProbe)
    queries.crossJoin(broadcast(cents))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(nearestN.getField("cent_id")).as("bucket"))
  }

  /** Persist an IVF-PQ index: `centroids` and `codebooks` (index
    * metadata, single files) plus `codes` — m small integers per vector
    * instead of dim floats, THE compression that makes a 100 TB ANN
    * index fit its serving tier — parquet-partitioned by coarse bucket,
    * so a probe's nProbe fan-out prunes partitions before any scan
    * (same layout contract as [[writeBucketedCorpus]]; the "c" prefix
    * keeps the partition value a string against read-back type
    * inference).
    */
  def writePqIndex(
      corpus: DataFrame,
      path: String,
      nCentroids: Int = 16,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 1,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      train: Option[DataFrame] = None): Unit = {
    val ix = buildPqIndex(corpus, nCentroids, m, ksub, iters, dim, idCol,
      vecCol, train)
    ix.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
    ix.codebooks.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/codebooks")
    codesFrame(ix.subs, ix.codebooks, ix.asgn)
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/codes")
  }

  /** The stored-codes rows: m sorted codes per vector + its coarse
    * bucket, laid out for `partitionBy("bucket")` — shared by the
    * initial write and the append path.
    */
  private def codesFrame(subs: DataFrame, cb: DataFrame, asgn: DataFrame)
      : DataFrame =
    assignPqCodes(subs, cb)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        s => s.getField("code")).as("codes"))
      .join(asgn.select(col("vec_id"), col("cent_id")), "vec_id")
      .withColumn("bucket", concat(lit("c"), col("cent_id")))
      .drop("cent_id")
      .repartition(col("bucket"))

  /** Incrementally add vectors to a STORED index ([[writePqIndex]])
    * without retraining: the new batch is coarse-assigned and encoded
    * against the index's existing centroids and codebooks (read back
    * from parquet — m and subvector width are inferred from the stored
    * codebook, so the call cannot disagree with the layout), and its
    * code rows are APPENDED into the bucket partitions. This is the
    * streaming-ANN maintenance shape at 100 TB: per batch, the cost is
    * encoding the batch (two broadcast joins, no shuffle of the stored
    * corpus); codebooks stay fixed until a full rebuild, exactly like a
    * production IVF-PQ index between retrains. The result is
    * bit-identical to an index built over the union with training
    * restricted to the original corpus (SimilaritySpec pins it).
    */
  def appendToPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      newVectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    val m = cb.agg(max(col("sub")).cast("int")).head().getInt(0) + 1
    val dsub = cb.limit(1).select(size(col("centv"))).head().getInt(0)
    val (asgn, subs) =
      encodeAgainst(newVectors, centroids, m, dsub, idCol, vecCol)
    codesFrame(subs, cb, asgn)
      .write.mode("append").partitionBy("bucket").parquet(s"$path/codes")
  }

  /** Probe a stored IVF-PQ index ([[writePqIndex]]): queries fan out to
    * their nProbe buckets, the codes table is scanned ONLY in those
    * partitions (dynamic partition pruning — the probed buckets reach
    * the scan as a runtime filter), candidates are reconstructed from
    * codebook entries and scored by exact cosine. Same math as
    * [[ivfPqTopK]], so the stored round-trip shares its oracle.
    */
  def probePqIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = false,
      excludeSelf: Boolean = true): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    val q = queryBuckets(centroids, queries, nProbe, idCol, vecCol)
      .withColumn("bucket", concat(lit("c"), col("bucket")))
    val c = spark.read.parquet(s"$path/codes")
      .select(col("vec_id"), col("bucket"), posexplode(col("codes")).as(Seq("sub", "code")))
      .join(broadcast(cb), Seq("sub", "code"))
      .groupBy(col("vec_id"), col("bucket"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("centv")))),
        s => s.getField("centv"))).as("_pqres"))
      .join(broadcast(centroids
          .withColumn("bucket", concat(lit("c"), col("cent_id")))
          .select(col("bucket"), col("centv"))),
        Seq("bucket"))
      .select(col("vec_id").as("corpus_id"),
        zip_with(col("centv"), col("_pqres"), (x, y) => x + y).as("cvec"),
        col("bucket"))
    bucketProbe(c, q, k, broadcastQueries, excludeSelf)
      .withColumnRenamed("cosine_sim", "approx_sim")
  }

  /** PQ shortlist + exact rerank — the standard serving recipe that
    * recovers accuracy lost to quantization: [[ivfPqTopK]] retrieves a
    * `shortlist`-sized candidate set per query from compressed codes,
    * then only those candidates' RAW vectors are fetched and rescored by
    * exact cosine (per query: shortlist raw-vector reads instead of a
    * corpus scan). Output matches the exact-scoring queries' shape
    * (cosine_sim = exact).
    */
  def ivfPqRerank(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      shortlist: Int = 20,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 1,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = false): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val short = ivfPqTopK(corpus, queries, shortlist, nCentroids, nProbe,
        m, ksub, iters, dim, idCol, vecCol, broadcastQueries)
      .select(col("query_id"), col("corpus_id"))
    rerankExact(short, corpus, queries, k, idCol, vecCol)
  }

  /** Exact-cosine rerank of ANY (query_id, corpus_id) shortlist — the
    * second half of shortlist-then-rerank, factored out so the shortlist
    * can come from the in-memory index ([[ivfPqRerank]]) or a stored one
    * ([[probePqIndex]]) interchangeably. Per query only the shortlist
    * rows' raw vectors are fetched; the corpus is never scanned.
    */
  def rerankExact(
      shortlist: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("corpus_id"))
    shortlist.select(col("query_id"), col("corpus_id"))
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv")),
        "query_id")
      .join(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("_cv")),
        "corpus_id")
      .withColumn("cosine_sim",
        round(graft.functions.CosineExpression.cosine(col("_qv"), col("_cv")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine_sim"), col("rk"))
  }

  /** SemDeDup-style semantic dedup decision: assign every vector to its
    * nearest of the `nCentroids` smallest-id vectors (the same
    * deterministic coarse quantizer as [[ivfTopK]], evaluated map-side
    * over a one-row broadcast), then within each cluster drop every
    * vector that has a smaller-id cluster-mate at cosine >= `threshold`.
    * Output: `(vec_id, cluster_id, dropped)` for the whole corpus.
    *
    * This is the shape that makes embedding-level dedup tractable at
    * corpus scale: the pairwise cosine confirm is bounded by the cluster
    * populations (corpus/nCentroids on average), never the corpus — the
    * same quadratic-avoidance the SemDeDup paper gets from k-means
    * clusters, with a quantizer whose assignment is replayable in plain
    * SQL (raw-cosine argmax, ties to the larger centroid id).
    */
  def semanticDedup(
      vecs: DataFrame,
      threshold: Double,
      nCentroids: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = vecs.orderBy(col(idCol)).limit(nCentroids)
      .agg(collect_list(struct(col(idCol).as("cent_id"), col(vecCol).as("centv")))
        .as("_cents"))
    val nearest1 = element_at(slice(reverse(array_sort(
      transform(col("_cents"), c => struct(
        graft.functions.CosineExpression.cosine(col(vecCol), c.getField("centv"))
          .as("sim"),
        c.getField("cent_id").as("cent_id"))))), 1, 1), 1).getField("cent_id")
    // persist: the assignment subplan (full corpus scan + per-row argmax
    // over nCentroids cosines) feeds BOTH sides of the drops self-join
    // plus the final output, and Spark has no common-subplan elimination
    // across self-joins — unpersisted it would execute three times.
    val assigned = vecs.crossJoin(broadcast(cents))
      .select(col(idCol).as("vec_id"), col(vecCol).as("_v"),
        nearest1.as("cluster_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drops = assigned.as("a").join(assigned.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(round(graft.functions.CosineExpression.cosine(
        col("a._v"), col("b._v")), 6) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cluster_id"))
      .join(drops.withColumn("_d", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        coalesce(col("_d"), lit(false)).as("dropped"))
  }

  /** Write `corpus` as parquet PARTITIONED BY its sign-LSH bucket — the
    * storage layout for an ANN corpus at scale: each of the 2^numPlanes
    * buckets is a partition directory, so a probe prunes to its matching
    * buckets before any scan happens. The planes are deterministic
    * ([[VectorFunctions.hyperplanes]]), so index build and probe agree
    * with no shared state.
    */
  def writeBucketedCorpus(
      corpus: DataFrame,
      path: String,
      numPlanes: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val planes = VectorFunctions.hyperplanes(numPlanes, dim)
    // "b" prefix keeps the partition value a string: an all-digit sign
    // pattern would otherwise be type-inferred back as an integer on read,
    // silently dropping leading zeros and breaking probe equality.
    corpus.select(col(idCol), col(vecCol),
        concat(lit("b"),
          graft.functions.SignBucketExpression.signBucket(col(vecCol), planes)).as("bucket"))
      // cluster by bucket before writing: one writer task per bucket
      // directory (not tasks × buckets small files) — the layout a probe
      // wants to scan at 100 TB
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** Probe a [[writeBucketedCorpus]] layout: top-k per query reading ONLY
    * the partitions whose bucket matches some query. The bucket equi-join
    * against the broadcast query frame triggers dynamic partition pruning
    * on the partitioned scan (SimilaritySpec asserts it), so the scan cost
    * is proportional to the probed buckets, not the corpus.
    */
  def probeBucketed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      k: Int,
      numPlanes: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = false,
      excludeSelf: Boolean = true): DataFrame = {
    val planes = VectorFunctions.hyperplanes(numPlanes, dim)
    val c = spark.read.parquet(path)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"), col("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      concat(lit("b"),
        graft.functions.SignBucketExpression.signBucket(col(vecCol), planes)).as("bucket"))
    bucketProbe(c, q, k, broadcastQueries, excludeSelf)
  }
}
