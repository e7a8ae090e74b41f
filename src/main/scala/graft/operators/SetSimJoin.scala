package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered EXACT set-similarity self-join — the PPJoin family's
  * prefix filter (without the positional refinements), the third member
  * of the near-dup toolbox next to MinHash-LSH ([[Dedup]]) and embedding
  * LSH ([[Similarity]]): unlike banding it is EXACT (provably no false
  * negatives, so no recall audit is ever needed), and unlike the
  * all-pairs verifier it never goes quadratic in the corpus.
  *
  * Elements are each document's distinct word n-gram shingles; the
  * similarity threshold is a RATIONAL num/den so the accept test is
  * integer cross-multiplication — no float boundary can split engines.
  *
  * The filter: order all elements globally rarest-first (document
  * frequency, ties lexicographic); a document of n elements exposes only
  * its first `p = n - ceil(t·n) + 1` elements as candidate keys. If B
  * shares none of A's prefix, then |A∩B| ≤ n_A - p_A = ceil(t·n_A) - 1
  * < t·n_A ≤ t·|A∪B|, hence J(A,B) < t — so every qualifying pair
  * collides on some prefix element, and rare-first ordering makes those
  * collisions scarce exactly where the corpus is big. Candidates are then
  * verified with an exact intersection count restricted to the candidate
  * pairs.
  */
object SetSimJoin {

  /** All pairs `(id_a < id_b)` whose shingle-set Jaccard ≥ num/den, with
    * exact integer `inter` / `n_union` columns. The rarest-first element
    * order is `(_df, shingle)` lexicographic, applied directly inside the
    * per-document window — shingle is unique per `dfreq` row, so this IS
    * the total order a global dense rank would encode, without ever
    * sorting the distinct-shingle inventory on one partition (that
    * inventory is corpus-scale for word n-grams, not vocabulary-scale).
    */
  def jaccardShingleJoin(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, num: Long = 1L, den: Long = 2L): DataFrame = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    require(num > 0 && den > 0 && num <= den,
      s"threshold num/den must be in (0, 1], got $num/$den")
    val el = TrainingData.shingleRows(docs, textCol, idCol, n).distinct()
    val sizes = el.groupBy(col("doc_id")).agg(count(lit(1)).as("n_el"))
    val dfreq = el.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
    val ord = Window.partitionBy(col("doc_id"))
      .orderBy(col("_df"), col("shingle"))
    val prefix = el.join(dfreq, "shingle").join(sizes, "doc_id")
      .withColumn("_pos", row_number().over(ord).cast("long"))
      .filter(col("_pos") <=
        col("n_el") - expr(s"(n_el * $num + $den - 1) div $den") + 1)
      .select(col("doc_id"), col("shingle"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verify, restricted to candidates: shingles of A that B has
    val inter = cand
      .join(el.select(col("doc_id").as("id_a"), col("shingle")), "id_a")
      .join(el.select(col("doc_id").as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("n_el").as("_na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_el").as("_nb")), "id_b")
      .withColumn("n_union", col("_na") + col("_nb") - col("inter"))
      // J >= num/den  <=>  inter·den >= union·num, exactly
      .filter(col("inter") * den >= col("n_union") * num)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_union"))
  }
}
