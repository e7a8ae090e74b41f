package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join at scale — the PassJoin
  * segment-partition scheme (Li/Deng/Feng, ICDE'11; also the shape behind
  * DuckDB's and Postgres pg_trgm's fuzzy-match pruning), re-expressed as
  * two explodes and one hash join.
  *
  * A naive `levenshtein(a, b) <= k` join is a cross product — quadratic
  * in rows AND each probe is O(|s|²) — the canonical scale-killer of
  * entity-resolution pipelines. The partition lemma kills it: split each
  * string into k+1 contiguous segments; any string within edit distance k
  * must contain at least one segment VERBATIM (k edits can touch at most
  * k of the k+1 segments), and that surviving segment's position can
  * shift by at most k (each shift needs one net insert/delete). So:
  *
  *   1. index side: each string emits its k+1 (segNo, srcLen, segment)
  *      keys — O(k) rows per string;
  *   2. probe side: each string emits, for every candidate source length
  *      within ±k of its own and every segment slot, the substrings at
  *      positions within ±k of that segment's home position — O(k³) rows
  *      per string, constant for fixed k;
  *   3. hash-join on (segNo, srcLen, segment) — full shuffle parallelism,
  *      no cross product — then one exact `levenshtein` pass over the
  *      candidate pairs only.
  *
  * The filter is SOUND (never loses a true pair — the partition lemma is
  * an if-then, the verify pass removes false candidates), so the output
  * is exactly the brute-force result.
  *
  * Skew caveat (documented, deliberate): a segment that is CONSTANT
  * across the corpus ("Customer#…"-style shared prefixes) degenerates its
  * bucket toward the full cross product — no sound segment scheme can
  * avoid that when the discriminating characters all live in one
  * segment's span. Production mitigation is choosing the string column
  * (or a canonicalized form) whose segments carry entropy — e.g. join on
  * a vocabulary (distinct strings) rather than raw rows, as
  * `q_fuzzy_names` does: dedup first, pair the dictionary, then fan
  * matches back out to rows.
  *
  * Strings shorter than k+1 characters cannot be segmented (some segment
  * would be empty and match everywhere); they are handled exactly via a
  * bounded broadcast nested-loop against ALL rows within the length
  * window — sound because edit distance ≥ length difference, and cheap
  * because a ≤ k-char vocabulary slice is tiny by construction.
  */
object EditDistanceJoin {

  /** All unordered pairs (id_a < id_b) of rows whose `strCol` values are
    * within Levenshtein distance `k`, with the exact distance. Input ids
    * must be unique; output columns: id_a, id_b, dist (int).
    */
  def selfJoin(df: DataFrame, strCol: String, idCol: String, k: Int)
      : DataFrame = {
    require(k >= 1 && k <= 4, s"k must be in [1,4], got $k")
    val q = k + 1
    val rows = df.select(col(idCol).cast("string").as("id"),
      col(strCol).as("s"), length(col(strCol)).as("len"))

    val longRows = rows.filter(col("len") >= q)
    val shortRows = rows.filter(col("len") < q)

    // 1. index: one row per (string, segment)
    val sigs = longRows
      .select(col("id").as("ida"), col("s").as("sa"), col("len").as("la"),
        explode(sequence(lit(0), lit(k))).as("segno"))
      .withColumn("seg", expr(
        s"substring(sa, ${segStartSql("la", "segno", q)} + 1, " +
          s"${segLenSql("la", "segno", q)})"))

    // 2. probe: one row per (string, candidate source length, segment
    // slot, position within the ±k shift window)
    val subs = longRows
      .select(col("id").as("idb"), col("s").as("sb"), col("len").as("lb"))
      .withColumn("la", explode(sequence(
        greatest(lit(q), col("lb") - k), col("lb") + k)))
      .withColumn("segno", explode(sequence(lit(0), lit(k))))
      .withColumn("home", expr(s"${segStartSql("la", "segno", q)}"))
      .withColumn("slen", expr(s"${segLenSql("la", "segno", q)}"))
      .withColumn("plo", greatest(lit(0), col("home") - k))
      // a window can be empty (segment longer than the probe string);
      // Spark's sequence(hi, lo) would count DOWN, inventing negative
      // positions — guard before exploding
      .withColumn("phi", least(col("lb") - col("slen"), col("home") + k))
      .filter(col("phi") >= col("plo"))
      .withColumn("p", explode(sequence(col("plo"), col("phi"))))
      .withColumn("seg", expr("substring(sb, p + 1, slen)"))
      .select(col("idb"), col("sb"), col("la"), col("segno"), col("seg"))

    val candLong = sigs.join(subs, Seq("la", "segno", "seg"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), col("sa"), col("sb"))
      .distinct()

    // short strings: exact bounded fallback (tiny by construction)
    val candShort = {
      val sh = shortRows.select(col("id").as("ida"), col("s").as("sa"),
        col("len").as("la"))
      val other = rows.select(col("id").as("idb"), col("s").as("sb"),
        col("len").as("lb"))
      broadcast(sh).join(other,
          col("ida") =!= col("idb") &&
            abs(col("la") - col("lb")) <= k)
        .select(least(col("ida"), col("idb")).as("ida"),
          greatest(col("ida"), col("idb")).as("idb"),
          when(col("ida") < col("idb"), col("sa")).otherwise(col("sb")).as("sa"),
          when(col("ida") < col("idb"), col("sb")).otherwise(col("sa")).as("sb"))
        .distinct()
    }

    candLong.unionByName(candShort)
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= k)
      .select(col("ida").as("id_a"), col("idb").as("id_b"), col("dist"))
  }

  // Segment geometry of an L-char string split q ways: the first
  // (q - L%q) segments take L div q chars, the rest one more. SQL text
  // (used inside expr()) so the explode columns can reference each other
  // without chained selects; `div` keeps everything integer-exact.
  private def segLenSql(l: String, i: String, q: Int): String =
    s"CAST(($l div $q) + (CASE WHEN $i >= $q - ($l % $q) THEN 1 ELSE 0 END) AS INT)"
  private def segStartSql(l: String, i: String, q: Int): String =
    s"CAST($i * ($l div $q) + GREATEST(0, $i - ($q - ($l % $q))) AS INT)"
}
