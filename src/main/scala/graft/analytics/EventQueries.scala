package graft.analytics

import graft.Tables._
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Streaming surface (SURVEY §2.9), verified through batch-equivalent runs
  * of the SAME transforms over the static `events` table. The DuckDB
  * oracles re-express tumbling/sliding/session windows in ANSI SQL
  * (time_bucket, lateral range, gaps-and-islands).
  *
  * All oracle SQL casts `ts` (stored as timestamp[ns]) to microsecond
  * TIMESTAMP first — Spark truncates ns→µs on read, so the oracle must
  * see the same instants.
  */
object EventQueries {

  /** ST1: tumbling 1-hour counts/sums per event_type. */
  val eventsHourly = Q("q_events_hourly",
    (s, d) => EventStreams.tumblingHourly(events(s, d))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
            event_type, count(*) AS n_events,
            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** ST2: sliding 1-hour/15-minute windows. Each event lands in exactly 4
    * windows — the oracle materializes them with a lateral range(4).
    */
  val eventsSliding = Q("q_events_sliding",
    (s, d) => EventStreams.slidingCounts(events(s, d))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                     - i * INTERVAL '15 minutes' AS window_start,
            event_type, count(*) AS n_events
            FROM events, range(4) AS t(i)
            GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** ST3: watermark horizon — events within 10 minutes of the max ts. */
  val eventsRecent = Q("q_events_recent",
    (s, d) => EventStreams.recentHorizon(events(s, d)).orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n_events FROM events
            WHERE CAST(ts AS TIMESTAMP) >=
              (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL '10 minutes'
            GROUP BY 1 ORDER BY event_type"""))

  /** ST4: 30-minute-gap sessionization (gaps-and-islands oracle). */
  val eventsSessions = Q("q_events_sessions",
    (s, d) => EventStreams.sessionize(events(s, d))
      .orderBy(col("user_id"), col("session_start")),
    Some("""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
            m AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS brk
                  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sess AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid FROM m)
            SELECT user_id, min(ts) AS session_start,
                   max(ts) + INTERVAL '30 minutes' AS session_end,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, session_start"""))

  /** ST5: stream dedup on event_id (first-by-timestamp survivors). */
  val eventsDedup = Q("q_events_dedup",
    (s, d) => EventStreams.dedupEvents(events(s, d)).orderBy(col("event_id")),
    Some("""SELECT event_id, min(CAST(ts AS TIMESTAMP)) AS first_ts,
            count(*) AS n_dupes FROM events GROUP BY 1 ORDER BY event_id"""))

  /** Stream-stream interval join (batch equivalent): purchases attributed
    * to same-user signups within the preceding hour.
    */
  val eventsAttribution = Q("q_events_attribution",
    (s, d) => graft.streaming.StatefulStreams.purchaseAttribution(events(s, d))
      .orderBy(col("user_id"), col("signup_ts"), col("purchase_ts")),
    Some("""SELECT p.user_id AS user_id, s.ts AS signup_ts,
            p.ts AS purchase_ts, p.value AS value
            FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                  FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'signup') s
            ON p.user_id = s.user_id
               AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL '1 hour'
            ORDER BY user_id, signup_ts, purchase_ts"""))

  /** LEFT OUTER interval join (batch equivalent of
    * [[graft.streaming.StatefulStreams.purchaseAttributionLeftOuter]]):
    * every purchase exactly-once — attributed when a same-user signup
    * precedes it within an hour, with NULL attribution otherwise. The
    * streaming twin emits the null rows watermark-late;
    * StatefulStreamsSpec pins stream ≡ batch including the null side.
    */
  val eventsAttributionOuter = Q("q_attribution_outer",
    (s, d) => graft.streaming.StatefulStreams
      .purchaseAttributionLeftOuter(events(s, d))
      .orderBy(col("user_id"), col("purchase_ts"), col("signup_ts")),
    Some("""SELECT p.user_id AS user_id, s.ts AS signup_ts,
            p.ts AS purchase_ts, p.value AS value
            FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                  FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                  FROM events WHERE event_type = 'signup') s
            ON p.user_id = s.user_id
               AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL '1 hour'
            ORDER BY user_id, purchase_ts, signup_ts"""))

  /** Backward as-of join: each purchase attributed to the LATEST same-user
    * signup at or before it (vs the interval join above, which keeps ALL
    * signups in range). Runs through the engine's native Catalyst operator
    * ([[graft.plans.AsOfJoinExec]] — custom logical node + strategy +
    * one-pass sorted merge); the composed union+window form is spec-pinned
    * equal. The right side is deduped per (user, ts) keeping the max
    * event_id so "latest" is a total order in both engines; DuckDB's
    * native ASOF JOIN is the oracle.
    */
  val asofJoin = Q("q_asof_join",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
      val signups = ev.filter(col("event_type") === "signup")
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("user_id"), col("ts").as("signup_ts"),
          col("event_id").as("signup_event_id"))
      graft.operators.AsOfJoin.backwardNative(purchases, signups,
          keyCols = Seq("user_id"), leftTime = "purchase_ts",
          rightTime = "signup_ts",
          rightPayload = Seq("signup_ts", "signup_event_id"), prefix = "")
        .orderBy(col("event_id"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS purchase_ts, value
                       FROM events WHERE event_type = 'purchase'),
                 s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS signup_ts,
                              event_id AS signup_event_id
                       FROM events WHERE event_type = 'signup'
                       QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                                  ORDER BY event_id DESC) = 1)
            SELECT p.event_id, p.user_id, p.purchase_ts, p.value,
                   s.signup_ts, s.signup_event_id
            FROM p ASOF LEFT JOIN s
              ON p.user_id = s.user_id AND s.signup_ts <= p.purchase_ts
            ORDER BY p.event_id"""))

  /** Forward as-of join: each signup attributed to its user's EARLIEST
    * purchase at or after it (the "next event" lookup — the mirror of
    * q_asof_join). Right side deduped per (user, ts) keeping the MIN
    * event_id so "earliest" is total in both engines.
    */
  val asofForward = Q("q_asof_forward",
    (s, d) => {
      val ev = events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts").as("signup_ts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").asc)
      val purchases = ev.filter(col("event_type") === "purchase")
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("user_id"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_event_id"), col("value"))
      graft.operators.AsOfJoin.forward(signups, purchases,
          keyCols = Seq("user_id"), leftTime = "signup_ts",
          rightTime = "purchase_ts",
          rightPayload = Seq("purchase_ts", "purchase_event_id", "value"),
          prefix = "")
        .orderBy(col("event_id"))
    },
    Some("""WITH s AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS signup_ts
                       FROM events WHERE event_type = 'signup'),
                 p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
                              event_id AS purchase_event_id, value
                       FROM events WHERE event_type = 'purchase'
                       QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                                  ORDER BY event_id ASC) = 1)
            SELECT s.event_id, s.user_id, s.signup_ts,
                   p.purchase_ts, p.purchase_event_id, p.value
            FROM s ASOF LEFT JOIN p
              ON s.user_id = p.user_id AND s.signup_ts <= p.purchase_ts
            ORDER BY s.event_id"""))

  /** Exact distinct users per event type (pairs with the approx variant). */
  val exactDistinctUsers = Q("q_exact_distinct_users",
    (s, d) => events(s, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
            count(*) AS n_events FROM events GROUP BY 1 ORDER BY event_type"""))

  /** Shared oracle CTEs: per-user time-ordered event-type transitions
    * aggregated to a weighted edge table. (ts, event_id) ordering is
    * total — event ids are unique — so the path sequence is deterministic
    * in both engines.
    */
  private val transitionSqlCtes =
    """s AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
         FROM events),
       p AS (SELECT event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS to_type
         FROM s),
       pairs AS (SELECT from_type, to_type, count(*) AS n FROM p
         WHERE to_type IS NOT NULL GROUP BY 1, 2)"""

  private def transitions(s: org.apache.spark.sql.SparkSession, d: String) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d).select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Behavioral path mining: which event follows which, corpus-wide — the
    * transition table funnels and next-action models start from. One
    * user-keyed window (per-user sequences are bounded) + one small
    * aggregation.
    */
  val eventPaths = Q("q_event_paths",
    (s, d) => transitions(s, d)
      .orderBy(col("n").desc, col("from_type"), col("to_type")),
    Some(s"""WITH $transitionSqlCtes
         SELECT from_type, to_type, n FROM pairs
         ORDER BY n DESC, from_type, to_type"""))

  /** PageRank over the event-type transition graph — oracled ITERATIVE
    * floating-point computation ([[graft.operators.PageRank]]): per-edge
    * contributions are double (bit-identical per term) and per-node sums
    * are decimal-exact, so accumulation ORDER can never move the result;
    * the output rounds to 6 decimals because the double→decimal cast
    * itself differs by 1 ulp between engines (Spark goes through the
    * shortest decimal repr, DuckDB through scaled multiply — observed at
    * sf0.001), and three iterations keep that at the ~16th digit.
    */
  val eventPagerank = Q("q_event_pagerank",
    (s, d) => {
      val edges = transitions(s, d).select(col("from_type").as("from"),
        col("to_type").as("to"), col("n").cast("double").as("weight"))
      val nodes = events(s, d).select(col("event_type")).distinct()
      graft.operators.PageRank.run(nodes, edges, iters = 3)
        .select(col("node"), round(col("p"), 6).as("pagerank"))
        .orderBy(col("node"))
    },
    Some {
      def iter(k: Int): String =
        s"""pr$k AS (
           SELECT n.node,
             CAST(0.15 AS DOUBLE) / ANY_VALUE(c) + CAST(0.85 AS DOUBLE) *
               coalesce(CAST(sum(CAST(pp.p * e.n / e.out_w AS DECIMAL(38,20)))
                 AS DOUBLE), CAST(0 AS DOUBLE)) AS p
           FROM nodes n CROSS JOIN cnt
           LEFT JOIN e ON e.to_type = n.node
           LEFT JOIN pr${k - 1} pp ON pp.node = e.from_type
           GROUP BY n.node)"""
      s"""WITH $transitionSqlCtes,
         nodes AS (SELECT DISTINCT event_type AS node FROM events),
         cnt AS (SELECT count(*) AS c FROM nodes),
         outw AS (SELECT from_type, sum(n) AS out_w FROM pairs GROUP BY 1),
         e AS (SELECT p.from_type, p.to_type, CAST(p.n AS DOUBLE) AS n,
             CAST(o.out_w AS DOUBLE) AS out_w
           FROM pairs p JOIN outw o USING (from_type)),
         pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / c AS p FROM nodes, cnt),
         ${iter(1)}, ${iter(2)}, ${iter(3)}
         SELECT node, round(p, 6) AS pagerank FROM pr3 ORDER BY node"""
    })

  /** Ordered funnel completion: per user, the first signup, the first
    * view strictly after it, the first purchase strictly after that —
    * three chained min-aggregations (each one key-partitioned shuffle over
    * progressively fewer rows), no per-user sequence materialization. The
    * report is one row per funnel stage with user counts.
    */
  val funnel = Q("q_funnel",
    (s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "view").join(t1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val n1 = t1.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_signup"))
      val n2 = t2.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_view"))
      val n3 = t3.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase"))
      n1.unionByName(n2).unionByName(n3)
        .select(col("stage"), col("n").as("n_users")).orderBy(col("stage"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
             FROM events),
           t1 AS (SELECT user_id, min(ts) AS t1 FROM ev
             WHERE event_type = 'signup' GROUP BY 1),
           t2 AS (SELECT e.user_id, min(e.ts) AS t2
             FROM ev e JOIN t1 ON e.user_id = t1.user_id
             WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY 1),
           t3 AS (SELECT e.user_id, min(e.ts) AS t3
             FROM ev e JOIN t2 ON e.user_id = t2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
           SELECT stage, n_users FROM (
             SELECT '1_signup' AS stage, count(*) AS n_users FROM t1
             UNION ALL SELECT '2_view', count(*) FROM t2
             UNION ALL SELECT '3_purchase', count(*) FROM t3)
           ORDER BY stage"""))

  /** Weekly retention cohorts: users grouped by first-activity week,
    * counted as retained in each later week they appear — the
    * (cohort, offset) matrix every growth dashboard draws. Two shuffles:
    * the per-user first-week aggregate and the cohort-cell count.
    */
  val retentionCohorts = Q("q_retention_cohorts",
    (s, d) => {
      // epoch-week index (floor(days-since-epoch / 7)): year(ts)*100 +
      // weekofyear(ts) would mislabel ISO week 1 spilling across a
      // calendar-year boundary (Dec 30 landing "before" the same year's
      // week 52) — the epoch week is boundary-free and totally ordered
      val ev = events(s, d).select(col("user_id"),
        floor(unix_date(col("ts").cast("date")).cast("double") / 7.0)
          .cast("bigint").as("wk"))
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      ev.select(col("user_id"), col("wk").as("active_wk"))
        .distinct()
        .join(first, "user_id")
        .groupBy(col("cohort"), col("active_wk"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort"), col("active_wk"))
    },
    Some("""WITH ev AS (SELECT user_id,
             CAST(floor(CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE)
               - DATE '1970-01-01' AS DOUBLE) / 7.0) AS BIGINT) AS wk
             FROM events),
           first AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1),
           active AS (SELECT DISTINCT user_id, wk AS active_wk FROM ev)
           SELECT cohort, active_wk, count(*) AS n_users
           FROM active JOIN first USING (user_id)
           GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** X55: exact triangle counting on the co-supplier graph (suppliers
    * linked when they ship the same part) via degree orientation
    * ([[graft.operators.Graphs.triangleCount]] — the skew-safe join
    * formulation). The subgraph is ABSOLUTE-bounded on both key ranges —
    * co-occurrence graphs densify as the corpus grows, so a proportional
    * cap would make this audit row quadratic in SF (the round-6
    * audit-tier lesson); a fixed window keeps its cost constant at any
    * scale while GraphsSpec carries the correctness burden. The oracle
    * derives the same edges and counts with the canonical u&lt;v&lt;w
    * triple join; equal counts pin that the orientation neither loses
    * nor double-counts a triangle.
    */
  val triangles = Q("q_triangles",
    (s, d) => {
      val ps = lineitem(s, d)
        .filter(col("l_partkey") < 12 && col("l_suppkey") < 120)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val edges = ps.as("x").join(ps.as("y"),
          col("x.l_partkey") === col("y.l_partkey") &&
            col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("src"), col("y.l_suppkey").as("dst"))
      graft.operators.Graphs.triangleCount(edges, "src", "dst")
    },
    Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_partkey < 12 AND l_suppkey < 120),
         e AS (SELECT DISTINCT x.l_suppkey AS u, y.l_suppkey AS v
           FROM ps x JOIN ps y ON x.l_partkey = y.l_partkey
             AND x.l_suppkey < y.l_suppkey),
         nodes AS (SELECT u AS n FROM e UNION SELECT v FROM e),
         tri AS (SELECT count(*) AS n_triangles
           FROM e e1 JOIN e e2 ON e2.u = e1.v
           JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
         SELECT (SELECT count(*) FROM nodes) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges, n_triangles FROM tri"""))

  /** X83: feature-store point-in-time join
    * ([[graft.operators.FeatureStore]]) — the training-set assembly: for
    * each purchase (the label spine), the user's latest signup, view
    * (with its value), and click AT OR BEFORE the purchase timestamp.
    * Three feature tables, three bounded as-of shuffles, zero future
    * leakage; each feature table deduped per (user, ts) by max event_id
    * so "latest" is total in both engines. Oracle = chained DuckDB ASOF
    * LEFT JOINs.
    */
  val pitFeatures = Q("q_pit_features",
    (s, d) => {
      import graft.operators.FeatureStore
      import graft.operators.FeatureStore.FeatureTable
      val ev = events(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
      def latest(t: String) = ev.filter(col("event_type") === t)
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      val spine = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("value"))
      val signups = latest("signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      val views = latest("view")
        .select(col("user_id"), col("ts").as("view_ts"),
          col("value").as("view_value"))
      val clicks = latest("click")
        .select(col("user_id"), col("ts").as("click_ts"))
      FeatureStore.pointInTime(spine, "purchase_ts", Seq(
          FeatureTable(signups, Seq("user_id"), "signup_ts",
            Seq("signup_ts")),
          FeatureTable(views, Seq("user_id"), "view_ts",
            Seq("view_ts", "view_value")),
          FeatureTable(clicks, Seq("user_id"), "click_ts",
            Seq("click_ts"))))
        .orderBy(col("event_id"))
    },
    Some("""WITH p AS (SELECT event_id, user_id,
                   CAST(ts AS TIMESTAMP) AS purchase_ts, value
                 FROM events WHERE event_type = 'purchase'),
               s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS signup_ts
                 FROM events WHERE event_type = 'signup'
                 QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                            ORDER BY event_id DESC) = 1),
               v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts,
                   value AS view_value
                 FROM events WHERE event_type = 'view'
                 QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                            ORDER BY event_id DESC) = 1),
               c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS click_ts
                 FROM events WHERE event_type = 'click'
                 QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                            ORDER BY event_id DESC) = 1)
          SELECT p.event_id, p.user_id, p.purchase_ts, p.value,
                 s.signup_ts, v.view_ts, v.view_value, c.click_ts
          FROM p
          ASOF LEFT JOIN s ON p.user_id = s.user_id
            AND s.signup_ts <= p.purchase_ts
          ASOF LEFT JOIN v ON p.user_id = v.user_id
            AND v.view_ts <= p.purchase_ts
          ASOF LEFT JOIN c ON p.user_id = c.user_id
            AND c.click_ts <= p.purchase_ts
          ORDER BY p.event_id"""))

  /** X85: KMV distinct-user sketch per event type
    * ([[graft.operators.KmvSketch]]) — the HASH-ORACLED approximate
    * distinct (HLL's float estimator keeps q_approx_distinct_parts
    * rows-only; KMV's single integer division replays exactly). Built
    * INCREMENTALLY: each event-id half sketches independently, the
    * k-row states merge, and the estimate derives from merged state —
    * the oracle recomputes over the full table, so the hash match
    * proves merge ≡ recompute on top of the estimator itself.
    */
  val kmvDistinct = Q("q_kmv_distinct",
    (s, d) => {
      import graft.operators.KmvSketch
      val ev = events(s, d)
      val k = 64
      val halves = Seq(0, 1).map(h => KmvSketch.state(
        ev.filter(pmod(col("event_id"), lit(2)) === h),
        Seq("event_type"), "user_id", k))
      KmvSketch.estimate(
          KmvSketch.mergeState(halves(0), halves(1), Seq("event_type"), k),
          Seq("event_type"), k)
        .withColumnRenamed("est", "est_users")
        .orderBy(col("event_type"))
    },
    Some(s"""WITH h AS (SELECT DISTINCT event_type,
               ${NorthStarQueries.md5Hex8Sql("CAST(user_id AS VARCHAR)")} + 1
                 AS hv
             FROM events WHERE user_id IS NOT NULL),
           r AS (SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv)
                 AS rnk
             FROM h),
           s AS (SELECT event_type, count(*) AS n, max(hv) AS hk
             FROM r WHERE rnk <= 64 GROUP BY 1)
          SELECT event_type,
            CAST(CASE WHEN n < 64 THEN n
                 ELSE (63 * 4294967296) // hk END AS BIGINT) AS est_users
          FROM s ORDER BY event_type"""))

  val all: Seq[Q] = Seq(eventsHourly, eventsSliding, eventsRecent,
    eventsSessions, eventsDedup, eventsAttribution, eventsAttributionOuter,
    asofJoin, asofForward,
    exactDistinctUsers, eventPaths, eventPagerank, funnel, retentionCohorts,
    triangles, pitFeatures, kmvDistinct)
}
