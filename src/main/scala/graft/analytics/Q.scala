package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One catalog entry: a Spark query plus (optionally) the ANSI-SQL oracle
  * the driver runs in DuckDB over the same parquet tables. Queries without
  * an oracle get the driver's weaker rows-only check (approx sketches,
  * hash functions DuckDB lacks).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDsl {
  /** Exact, order-independent sum of a money-like double: per-row cast to
    * decimal(27,4), exact decimal sum, back to double. Bit-identical
    * between Spark and DuckDB regardless of partitioning/accumulation
    * order — the float-parity workhorse for the oracle hash-compare.
    * Scale 4 (not 2) so that products of two 2-decimal values — e.g.
    * `price * (1-discount)` — cast with NO rounding at all; at scale 2 the
    * frequent exact .xx5 boundary would split on Spark's HALF_UP vs
    * DuckDB's HALF_EVEN.
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(27,4)")).cast("double")

  /** SQL twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(27,4))) AS DOUBLE)"

  /** Row-level revenue expression (TPC-H style). */
  def revenue(price: Column, discount: Column): Column = price * (lit(1) - discount)
  val revenueSql = "l_extendedprice*(1-l_discount)"
}
