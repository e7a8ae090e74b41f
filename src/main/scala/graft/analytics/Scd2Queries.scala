package graft.analytics

import graft.Tables._
import graft.etl.{Scd2, Scd2Config}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCD2 dimension + fact-assembly queries (SURVEY A7/W5/J1), oracled with
  * pure ANSI SQL that replays the same merge semantics set-based.
  */
object Scd2Queries {

  private val cfg = Scd2Config(
    naturalKey = Seq("customer_id"),
    tracked = Seq("customer_name", "segment"),
    surrogateKey = "customer_key")

  private val d1 = java.sql.Date.valueOf("2024-06-01")
  private val d2 = java.sql.Date.valueOf("2024-07-01")

  private def incoming(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey").as("customer_id"),
      col("c_name").as("customer_name"),
      col("c_mktsegment").as("segment"))

  /** A7 initial load: empty dimension + full customer batch. */
  val scd2Initial = Q("q_scd2_initial",
    (s, d) => Scd2.initialLoad(incoming(s, d), cfg, d1).orderBy(col("customer_key")),
    Some("""SELECT row_number() OVER (ORDER BY c_custkey) AS customer_key,
            c_custkey AS customer_id, c_name AS customer_name,
            c_mktsegment AS segment,
            DATE '2024-06-01' AS effective_date,
            CAST(NULL AS DATE) AS expiry_date,
            CAST(1 AS INT) AS is_current,
            CAST(1 AS INT) AS version
            FROM customer ORDER BY customer_key"""))

  /** A7 incremental merge: every 7th customer changes segment → prior
    * version expires, new version appends with the next key range;
    * unchanged rows carry forward untouched.
    */
  val scd2Upsert = Q("q_scd2_upsert",
    (s, d) => {
      val dim0 = Scd2.initialLoad(incoming(s, d), cfg, d1)
      val changed = incoming(s, d).withColumn("segment",
        when(col("customer_id") % 7 === 0, lit("CHANGED")).otherwise(col("segment")))
      Scd2.merge(dim0, changed, cfg, d2).orderBy(col("customer_key"))
    },
    Some("""WITH dim AS (
              SELECT row_number() OVER (ORDER BY c_custkey) AS customer_key,
                     c_custkey AS customer_id, c_name AS customer_name,
                     c_mktsegment AS segment
              FROM customer),
            mx AS (SELECT count(*) AS n FROM customer),
            changed AS (SELECT * FROM dim WHERE customer_id % 7 = 0)
            SELECT customer_key, customer_id, customer_name, segment,
                   DATE '2024-06-01' AS effective_date,
                   CASE WHEN customer_id % 7 = 0 THEN DATE '2024-07-01' END AS expiry_date,
                   CAST(CASE WHEN customer_id % 7 = 0 THEN 0 ELSE 1 END AS INT) AS is_current,
                   CAST(1 AS INT) AS version
            FROM dim
            UNION ALL
            SELECT (SELECT n FROM mx) + row_number() OVER (ORDER BY customer_id),
                   customer_id, customer_name, 'CHANGED',
                   DATE '2024-07-01', CAST(NULL AS DATE), CAST(1 AS INT),
                   CAST(2 AS INT)
            FROM changed
            ORDER BY customer_key"""))

  /** J1/P3/P4: fact assembly — natural keys mapped to surrogate keys via
    * broadcast left join against the current dimension slice.
    */
  val factAssembly = Q("q_fact_assembly",
    (s, d) => {
      val dim = Scd2.initialLoad(incoming(s, d), cfg, d1)
        .filter(col("is_current") === 1)
        .select(col("customer_id"), col("customer_key"))
      orders(s, d)
        .join(broadcast(dim), col("o_custkey") === col("customer_id"), "left")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"),
          col("customer_key"), col("o_totalprice").as("sales"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH dim AS (
              SELECT row_number() OVER (ORDER BY c_custkey) AS customer_key,
                     c_custkey AS customer_id
              FROM customer)
            SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
                   customer_key, o_totalprice AS sales
            FROM orders LEFT JOIN dim ON o_custkey = customer_id
            ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(scd2Initial, scd2Upsert, factAssembly)
}
