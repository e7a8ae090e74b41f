package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for pretraining-scale corpora. Four tiers:
  * exact (hash group-by), MinHash+LSH (banded bucket join), SimHash
  * (bit-sketch), and exact n-gram Jaccard (ground truth / verifier).
  *
  * Scale design: every variant reduces the O(n²) pair space *before* any
  * join — exact dedup groups on a 128-bit hash; MinHash joins only within
  * LSH bands; SimHash buckets on sketch prefixes. Nothing here collects to
  * the driver; all outputs are DataFrames.
  */
object Dedup {

  /** Exact dedup: keep the smallest `idCol` per distinct `textCol` hash.
    * Group-by on md5 (not the raw text) keeps shuffle rows narrow —
    * at 100 TB you shuffle 16-byte keys, not document bodies.
    */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Survivor set of exact dedup: the full rows whose id was kept. */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signature: for each of `numHashes` seeded permutations,
    * min over shingles of `(a*h + b) mod p` where `h = xxhash64(shingle)`.
    * Pure built-ins (higher-order functions + xxhash64) — codegen'd,
    * deterministic, no UDF, no ml.linalg dependency.
    */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    // Universal hashing mod 2^31-1: shrink xxhash64 into [0, p) first so
    // a*h + b stays well inside the long range (ANSI-safe, no overflow).
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    val sigs = (0 until numHashes).map { i =>
      val a = 1L + ((seed + i * 1299709L) % (p - 1))
      val b = (seed * 31L + i * 7919L) % p
      aggregate(
        shingles,
        lit(Long.MaxValue),
        (acc, s) => least(acc, pmod(pmod(xxhash64(s), lit(p)) * a + b, lit(p))))
    }
    array(sigs: _*)
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; exact Jaccard on candidates only. `bands * rowsPerBand` must
    * equal the signature length. Returns (id_a, id_b, n_shared_bands).
    */
  def minhashLshCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Materialize the (distinct) shingle array ONCE per row before fanning
    // out into the per-hash aggregates — inlining the array expression
    // would re-split the text numHashes times.
    val sig = df
      .select(col(idCol).as("doc"),
        array_distinct(TextFunctions.wordShingles(col(textCol), shingleSize)).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc"), minhashSignature(col("sh"), numHashes).as("sig"))

    val banded = sig.select(col("doc"), explode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        md5(concat_ws(",",
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), x => x.cast("string")),
          b.cast("string")))))
      .as("bucket"))

    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 16-bit SimHash from md5 nibbles of each token: bit b of the sketch is
    * the sign of sum over tokens of (bit set ? +1 : -1). md5-derived bits
    * keep the sketch oracle-expressible in ANSI SQL (unlike xxhash64).
    */
  def simhash16(textCol: Column): Column = {
    val toks = split(trim(textCol), "\\s+")
    val bits = (0 until 16).map { b =>
      val hexPos = b / 4 + 1      // which hex digit of the md5
      val bitInNibble = b % 4
      val vote = aggregate(
        toks,
        lit(0L),
        (acc, t) => {
          val nibble = conv(substring(md5(t), hexPos, 1), 16, 10).cast("long")
          acc + when(floor(nibble / math.pow(2, bitInNibble).toLong) % 2 === 1, 1L).otherwise(-1L)
        })
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Exact word-n-gram Jaccard similarity for all pairs above `threshold`
    * within `df` — the ground-truth near-dup measure. The explode/join is
    * bounded by shingle selectivity; at scale, run it only on LSH
    * candidates (see [[minhashLshCandidates]]).
    */
  def jaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      threshold: Double): DataFrame = {
    val sh = df.select(col(idCol).as("doc"),
        explode(array_distinct(TextFunctions.wordShingles(col(textCol), n))).as("shingle"))
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), round(col("jaccard"), 6).as("jaccard"))
  }
}
