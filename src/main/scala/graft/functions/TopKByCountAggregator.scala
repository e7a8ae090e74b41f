package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, count) entry of a top-k result. */
final case class ValueCount(value: String, n: Long)

/** Typed `Aggregator` (the UDAF surface): exact top-k values by count
  * per group, ties broken by value — deterministic under any
  * partitioning, which the spec pins by re-aggregating repartitioned
  * input.
  *
  * The buffer is the full value→count map of the group, so partial
  * aggregation happens map-side (each partition builds its own map;
  * `merge` adds counts) and the shuffle carries one map per group per
  * partition, not one row per value. Memory is bounded by the per-group
  * DISTINCT value count — right for bounded vocabularies (tokens, status
  * codes); for unbounded domains use a sketch (count-min) instead, which
  * this exact form is the verification twin of.
  *
  * This is the one aggregation shape the built-in `functions._` can't
  * express in a single pass: `groupBy(g, v).count` + rank window needs a
  * second shuffle on the (g, v) pairs, while the UDAF collapses to one
  * shuffle of pre-aggregated maps.
  */
final class TopKByCountAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[ValueCount]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    // fold the smaller map into the larger one
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(big) { case (acc, (v, c)) =>
      acc.updated(v, acc.getOrElse(v, 0L) + c)
    }
  }

  override def finish(reduction: Map[String, Long]): Seq[ValueCount] =
    reduction.toSeq
      .sortWith { case ((va, ca), (vb, cb)) =>
        if (ca != cb) ca > cb
        else TopKByCountAggregator.utf8Compare(va, vb) < 0
      }
      .take(k)
      .map { case (v, c) => ValueCount(v, c) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[ValueCount]] =
    ExpressionEncoder[Seq[ValueCount]]()
}

object TopKByCountAggregator {
  /** Column-function form: `topKByCount(3)(col("token"))`. */
  def topKByCount(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByCountAggregator(k))

  /** Unsigned UTF-8 byte comparison — the order Spark SQL string sorts
    * and the DuckDB oracle's ORDER BY use. JVM `String.compareTo`
    * (UTF-16 code units) diverges on supplementary-plane characters
    * (surrogate pairs sort before U+E000..U+FFFF instead of after), so a
    * tiebreak on it could pick a different k-th value than the oracle's
    * rank-window replay.
    */
  private[functions] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}
