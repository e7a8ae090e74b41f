package graft.analytics

import graft.Tables._
import QueryDsl._
import org.apache.spark.sql.functions._

/** Extended analytics surface beyond the reference's literal queries:
  * hierarchical rollups, pivoted cross-tabs, exact percentiles — the
  * standard BI shapes a user of the reference's dashboard would reach for
  * next, all oracle-verified.
  */
object ExtendedQueries {

  /** ROLLUP: nation → year hierarchy with subtotals and a grand total.
    * `grouping()` flags disambiguate real nulls from subtotal rows.
    */
  val rollupSales = Q("q_rollup_sales",
    (s, d) => orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("order_year", year(col("o_orderdate")))
      .rollup(col("n_name"), col("order_year"))
      .agg(dsum(col("o_totalprice")).as("total_sales"), count(lit(1)).as("n_orders"),
        (grouping(col("n_name")) * 2 + grouping(col("order_year")))
          .cast("int").as("is_total_row"))
      .orderBy(col("is_total_row"), col("n_name"), col("order_year")),
    Some(s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS order_year,
             ${dsumSql("o_totalprice")} AS total_sales, count(*) AS n_orders,
             CAST(CASE WHEN GROUPING(n_name) = 1 AND GROUPING(year(o_orderdate)) = 1 THEN 3
                       WHEN GROUPING(year(o_orderdate)) = 1 THEN 1
                       ELSE 0 END AS INT) AS is_total_row
             FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             GROUP BY ROLLUP (n_name, year(o_orderdate))
             ORDER BY is_total_row, n_name, order_year"""))

  /** CUBE: all 2^2 grouping combinations of (status, priority) in one
    * pass — the full-lattice form of the rollup above, with the same
    * grouping-flag disambiguation of subtotal rows.
    */
  val cubeSales = Q("q_cube_sales",
    (s, d) => orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("total_sales"), count(lit(1)).as("n_orders"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("int").as("grp"))
      .orderBy(col("grp"), col("o_orderstatus"), col("o_orderpriority")),
    Some(s"""SELECT o_orderstatus, o_orderpriority,
             ${dsumSql("o_totalprice")} AS total_sales, count(*) AS n_orders,
             CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
               AS grp
             FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             ORDER BY grp, o_orderstatus, o_orderpriority"""))

  /** UNPIVOT/melt: wide per-flag metrics to long (flag, metric, value)
    * rows — the inverse of the pivot below (metrics cast to one type, as
    * melt requires).
    */
  val unpivotMetrics = Q("q_unpivot",
    (s, d) => lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n_lines"),
        dsum(col("l_quantity")).as("total_qty"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("n_lines"), col("total_qty")), "metric", "value")
      .orderBy(col("l_returnflag"), col("metric")),
    Some(s"""WITH b AS (SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n_lines,
               ${dsumSql("l_quantity")} AS total_qty
               FROM lineitem GROUP BY 1)
             SELECT l_returnflag, 'n_lines' AS metric, n_lines AS value FROM b
             UNION ALL
             SELECT l_returnflag, 'total_qty', total_qty FROM b
             ORDER BY l_returnflag, metric"""))

  /** Pivot: revenue per year cross-tabbed by market segment (the
    * dashboard's stacked-chart shape). Oracle uses conditional
    * aggregation — column names must match the pivoted output.
    */
  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  val pivotSegmentYear = Q("q_pivot_segment_year",
    (s, d) => orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .pivot("c_mktsegment", segments)
      .agg(dsum(col("o_totalprice")))
      .orderBy(col("order_year")),
    Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
             ${segments.map(g =>
               s"CAST(sum(CASE WHEN c_mktsegment = '$g' THEN CAST(o_totalprice AS DECIMAL(27,4)) END) AS DOUBLE) AS $g")
               .mkString(", ")}
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY 1 ORDER BY order_year"""))

  /** Exact interpolated percentiles (median/p90 order value per status).
    * Spark `percentile` and DuckDB `quantile_cont` share the continuous
    * interpolation definition.
    */
  val percentiles = Q("q_percentiles",
    (s, d) => orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
            round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
            round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
            count(*) AS n
            FROM orders GROUP BY 1 ORDER BY o_orderstatus"""))

  /** Histogram bucketing via width_bucket (value distribution shape). */
  val histogram = Q("q_histogram",
    (s, d) => lineitem(s, d)
      .select(width_bucket(col("l_quantity"), lit(0.0), lit(50.0), lit(10L)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket")),
    // DuckDB 1.0 has no width_bucket — replay its definition arithmetically.
    Some("""SELECT CAST(CASE WHEN l_quantity < 0 THEN 0
                             WHEN l_quantity >= 50 THEN 11
                             ELSE 1 + floor(l_quantity / 5.0) END AS BIGINT) AS bucket,
            count(*) AS n FROM lineitem GROUP BY 1 ORDER BY bucket"""))

  /** Conditional aggregation (count_if / sum-where family). */
  val conditionalAgg = Q("q_conditional_agg",
    (s, d) => lineitem(s, d).agg(
      count_if(col("l_returnflag") === "R").as("n_returned"),
      count_if(col("l_discount") > 0.05).as("n_discounted"),
      dsum(when(col("l_returnflag") === "R",
        revenue(col("l_extendedprice"), col("l_discount")))).as("returned_revenue")),
    Some(s"""SELECT count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
             count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
             CAST(sum(CAST($revenueSql AS DECIMAL(27,4)))
                  FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS returned_revenue
             FROM lineitem"""))

  /** GROUPING SETS: two independent rollup axes (by nation, by status) in
    * one pass over the join — the general form of the marts' rollups.
    */
  val groupingSets = Q("q_grouping_sets",
    (s, d) => {
      val j = orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      j.groupingSets(Seq(Seq(col("n_name")), Seq(col("o_orderstatus"))),
          col("n_name"), col("o_orderstatus"))
        .agg(dsum(col("o_totalprice")).as("total_sales"), count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"), col("o_orderstatus"))
    },
    Some(s"""SELECT n_name, o_orderstatus,
             ${dsumSql("o_totalprice")} AS total_sales, count(*) AS n_orders
             FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             GROUP BY GROUPING SETS ((n_name), (o_orderstatus))
             ORDER BY n_name, o_orderstatus"""))

  /** Cumulative revenue over months (running-total window; exact decimal
    * accumulation keeps the cumulative sums oracle-exact too).
    */
  val runningTotal = Q("q_running_total",
    (s, d) => {
      val monthly = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))
          .cast("decimal(27,4)")).as("rev_dec"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("order_year"), col("order_month"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      monthly
        .withColumn("cumulative_revenue", sum(col("rev_dec")).over(w).cast("double"))
        .select(col("order_year"), col("order_month"),
          col("rev_dec").cast("double").as("revenue"), col("cumulative_revenue"))
        .orderBy(col("order_year"), col("order_month"))
    },
    Some(s"""WITH monthly AS (
             SELECT CAST(year(o_orderdate) AS INT) AS order_year,
                    CAST(month(o_orderdate) AS INT) AS order_month,
                    sum(CAST($revenueSql AS DECIMAL(27,4))) AS rev_dec
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2)
             SELECT order_year, order_month,
                    CAST(rev_dec AS DOUBLE) AS revenue,
                    CAST(sum(rev_dec) OVER (ORDER BY order_year, order_month
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cumulative_revenue
             FROM monthly ORDER BY order_year, order_month"""))

  /** Per-customer revenue within segment + its ranking window — shared by
    * q_window_stats and q_top_per_group so the tiebreak can never drift
    * between them.
    */
  private def segmentRevenue(s: org.apache.spark.sql.SparkSession, d: String) =
    orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(dsum(col("o_totalprice")).as("revenue"))

  private val segmentRevenueWindow = org.apache.spark.sql.expressions.Window
    .partitionBy(col("c_mktsegment"))
    .orderBy(col("revenue").desc, col("c_custkey"))

  /** Distribution window functions over one window spec (one sort):
    * segment-relative quartile, percent rank, cumulative distribution,
    * and the segment leader via first_value. Ties are broken by customer
    * key, so rank-family results are engine-independent.
    */
  val windowStats = Q("q_window_stats",
    (s, d) => {
      val w = segmentRevenueWindow
      segmentRevenue(s, d).select(
        col("c_custkey"), col("c_mktsegment"), col("revenue"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first_value(col("c_custkey")).over(w).as("segment_leader"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some(s"""WITH rev AS (
               SELECT c_custkey, c_mktsegment,
                      ${dsumSql("o_totalprice")} AS revenue
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_custkey, c_mktsegment)
             SELECT c_custkey, c_mktsegment, revenue,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               first_value(c_custkey) OVER w AS segment_leader
             FROM rev
             WINDOW w AS (PARTITION BY c_mktsegment
                          ORDER BY revenue DESC, c_custkey)
             ORDER BY c_mktsegment, c_custkey"""))

  /** Multiset set ops: EXCEPT ALL / INTERSECT ALL on order-priority
    * bags of two adjacent years (duplicates preserved — the semantics
    * DISTINCT-based set ops lose).
    */
  val exceptAllPriorities = Q("q_except_all",
    (s, d) => {
      def bag(y: Int) = orders(s, d)
        .filter(year(col("o_orderdate")) === y).select(col("o_orderpriority"))
      bag(1995).exceptAll(bag(1996))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH a AS (SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1995),
                 b AS (SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996),
                 x AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
            SELECT o_orderpriority, count(*) AS n FROM x
            GROUP BY 1 ORDER BY o_orderpriority"""))

  val intersectAllPriorities = Q("q_intersect_all",
    (s, d) => {
      def bag(y: Int) = orders(s, d)
        .filter(year(col("o_orderdate")) === y).select(col("o_orderpriority"))
      bag(1995).intersectAll(bag(1996))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH a AS (SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1995),
                 b AS (SELECT o_orderpriority FROM orders WHERE year(o_orderdate) = 1996),
                 x AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
            SELECT o_orderpriority, count(*) AS n FROM x
            GROUP BY 1 ORDER BY o_orderpriority"""))

  /** Gap-fill / resample: a complete month spine (sequence + explode over
    * the broadcast min/max span) left-joined to a sparse monthly series,
    * missing months filled with zeros — the time-series densification
    * every trend chart needs before plotting.
    */
  val gapFill = Q("q_gap_fill",
    (s, d) => {
      val sparse = orders(s, d).filter(col("o_totalprice") > 450000)
      val monthly = sparse
        .groupBy(trunc(col("o_orderdate"), "month").as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      val span = sparse.agg(
        trunc(min(col("o_orderdate")), "month").as("_lo"),
        trunc(max(col("o_orderdate")), "month").as("_hi"))
      val spine = span.select(
        explode(sequence(col("_lo"), col("_hi"), expr("INTERVAL 1 MONTH"))).as("month"))
      spine.join(monthly, Seq("month"), "left")
        .select(col("month"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("month"))
    },
    Some(s"""WITH sparse AS (SELECT * FROM orders WHERE o_totalprice > 450000),
             monthly AS (
               SELECT date_trunc('month', o_orderdate) AS month,
                      ${dsumSql("o_totalprice")} AS revenue, count(*) AS n_orders
               FROM sparse GROUP BY 1),
             spine AS (
               SELECT unnest(generate_series(
                 (SELECT date_trunc('month', min(o_orderdate)) FROM sparse),
                 (SELECT date_trunc('month', max(o_orderdate)) FROM sparse),
                 INTERVAL 1 MONTH))::DATE AS month)
             SELECT s.month, coalesce(m.revenue, 0.0) AS revenue,
                    coalesce(m.n_orders, 0) AS n_orders
             FROM spine s LEFT JOIN monthly m ON s.month = m.month
             ORDER BY s.month"""))

  /** Sorted array aggregation, emitted as a joined string (driver-hash
    * safe): the distinct priorities seen per order status.
    */
  val arrayAgg = Q("q_array_agg",
    (s, d) => orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
        .as("priorities"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
            string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
              AS priorities,
            count(*) AS n
            FROM orders GROUP BY 1 ORDER BY o_orderstatus"""))

  /** Top-3 customers per segment: the rank-filter shape Spark rewrites
    * into WindowGroupLimit (per-partition top-k before the full sort —
    * BucketingSpec asserts the optimized plan), vs q_top_customers'
    * global orderBy().limit().
    */
  val topPerGroup = Q("q_top_per_group",
    (s, d) => segmentRevenue(s, d)
      .withColumn("rk", row_number().over(segmentRevenueWindow))
      .filter(col("rk") <= 3)
      .orderBy(col("c_mktsegment"), col("rk")),
    Some(s"""WITH rev AS (
               SELECT c_custkey, c_mktsegment,
                      ${dsumSql("o_totalprice")} AS revenue
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_custkey, c_mktsegment),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                 ORDER BY revenue DESC, c_custkey) AS rk FROM rev)
             SELECT c_custkey, c_mktsegment, revenue, rk
             FROM ranked WHERE rk <= 3 ORDER BY c_mktsegment, rk"""))

  /** Statistical profile per return flag: Pearson correlation, population
    * covariance, and population stddev of (extendedprice, quantity) —
    * from DECIMAL-EXACT co-moment sums ([[QueryDsl.dsum]] family)
    * combined in double only at the very end, so both engines execute
    * the identical final IEEE ops and the result hash-compares exactly.
    * Spark's built-in `corr`/`covar_pop` accumulate co-moments in
    * doubles with partition-order-dependent rounding — statistically
    * fine, but not reproducible across engines or partitionings; the
    * exact-sum form is also the one-pass shape a 100 TB profile job
    * wants (six map-side-combined sums, one shuffle).
    */
  val correlation = Q("q_correlation",
    (s, d) => {
      val x = col("l_extendedprice")
      val y = col("l_quantity")
      lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dsum(x).as("sx"), dsum(y).as("sy"), dsum(x * y).as("sxy"),
          dsum(x * x).as("sxx"), dsum(y * y).as("syy"))
        .select(col("l_returnflag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
            .as("corr_price_qty"),
          round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6)
            .as("covar_pop_price_qty"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")), 6)
            .as("stddev_pop_price"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""WITH s AS (
             SELECT l_returnflag, count(*) AS n,
               ${dsumSql("l_extendedprice")} AS sx,
               ${dsumSql("l_quantity")} AS sy,
               ${dsumSql("l_extendedprice*l_quantity")} AS sxy,
               ${dsumSql("l_extendedprice*l_extendedprice")} AS sxx,
               ${dsumSql("l_quantity*l_quantity")} AS syy
             FROM lineitem GROUP BY 1)
             SELECT l_returnflag, n,
               round((n*sxy - sx*sy)
                 / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6)
                 AS corr_price_qty,
               round((sxy - sx*sy/n)/n, 6) AS covar_pop_price_qty,
               round(sqrt((sxx - sx*sx/n)/n), 6) AS stddev_pop_price
             FROM s ORDER BY l_returnflag"""))

  val all: Seq[Q] = Seq(rollupSales, cubeSales, unpivotMetrics,
    pivotSegmentYear, percentiles, histogram,
    conditionalAgg, groupingSets, runningTotal, windowStats,
    exceptAllPriorities, intersectAllPriorities, gapFill, arrayAgg,
    topPerGroup, correlation)
}
