package graft.analytics

import graft.Tables._
import graft.analytics.QueryDsl._
import graft.functions.{TextFunctions => TF}
import graft.operators.{Baskets, DataQuality, Dedup, EditDistanceJoin, Series, TrainingData}
import org.apache.spark.sql.functions._

/** Mining-tier queries: fuzzy string matching, time-series repair and
  * anomaly flagging, privacy-diversity auditing, weighted sampling, and
  * text-texture scoring. Every entry is DuckDB-oracled hash-exact — the
  * floating-point ones through the engine's decimal-exact-sum /
  * fixed-expression-order / round(6) parity discipline.
  */
object MiningQueries {

  /** X64: edit-distance similarity self-join over the part-name
    * vocabulary ([[graft.operators.EditDistanceJoin]] — PassJoin segment
    * pruning, never a cross product). Deduplicating to the DISTINCT name
    * dictionary first is the scale pattern the operator's scaladoc
    * prescribes: the dictionary is orders of magnitude smaller than the
    * fact table and its segments carry entropy, and the row counts fan
    * back with one small join. The oracle is the brute-force levenshtein
    * join (sound+complete filter ⇒ identical pairs).
    */
  val fuzzyNames = Q("q_fuzzy_names",
    (s, d) => {
      val names = part(s, d).groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_rows"))
      val pairs = EditDistanceJoin.selfJoin(
        names.select(col("name")), "name", "name", k = 2)
      pairs
        .join(names.select(col("name").as("id_a"), col("n_rows").as("n_a")),
          "id_a")
        .join(names.select(col("name").as("id_b"), col("n_rows").as("n_b")),
          "id_b")
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"),
          col("dist").cast("int").as("dist"), col("n_a"), col("n_b"))
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""WITH n AS (SELECT p_name AS name, count(*) AS n_rows
             FROM part GROUP BY 1)
           SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS INT) AS dist,
             a.n_rows AS n_a, b.n_rows AS n_b
           FROM n a JOIN n b ON a.name < b.name
             AND abs(length(a.name) - length(b.name)) <= 2
           WHERE levenshtein(a.name, b.name) <= 2
           ORDER BY name_a, name_b"""))

  /** X66: calendar gap-fill + linear interpolation
    * ([[graft.operators.Series.interpolateDaily]]) of a sparse daily
    * revenue series (one user cohort's purchases — deliberately gappy).
    * The lerp is the same written expression in both engines over
    * decimal-exact daily sums, rounded 6 for the cast ulp.
    */
  val interpolate = Q("q_interpolate",
    (s, d) => {
      val daily = events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") % 50 === 3)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(dsum(col("value")).as("v"))
      Series.interpolateDaily(daily, "day", "v").orderBy(col("day"))
    },
    Some(s"""WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               ${dsumSql("value")} AS v
             FROM events
             WHERE event_type = 'purchase' AND user_id % 50 = 3 GROUP BY 1),
           b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
           cal AS (SELECT CAST(unnest(generate_series(lo, hi,
               INTERVAL 1 DAY)) AS DATE) AS day FROM b),
           j AS (SELECT c.day, dd.v FROM cal c
             LEFT JOIN daily dd USING (day)),
           w AS (SELECT day, v,
             last_value(v IGNORE NULLS) OVER pre AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER pre AS pd,
             first_value(v IGNORE NULLS) OVER post AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER post AS nd
             FROM j
             WINDOW pre AS (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               post AS (ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           SELECT day, v IS NOT NULL AS observed,
             round(CASE WHEN v IS NOT NULL THEN v
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                 pv + (nv - pv) * (CAST(day - pd AS DOUBLE) /
                   CAST(nd - pd AS DOUBLE))
               WHEN pv IS NOT NULL THEN pv ELSE nv END, 6) AS value
           FROM w ORDER BY day"""))

  /** X67: rolling z-score anomaly detection
    * ([[graft.operators.Series.rollingZScore]]) over per-type daily
    * revenue: trailing-7-row mean/variance from DECIMAL-exact window
    * sums of x and x², z rounded 6, flag compared on the rounded value —
    * iterative-FP parity without a single data-ordered float sum.
    */
  val anomaly = Q("q_anomaly",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(dsum(col("value")).as("daily_total"))
      Series.rollingZScore(daily, "event_type", "day", "daily_total",
          windowRows = 7, threshold = 2.0)
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""WITH daily AS (SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               ${dsumSql("value")} AS x
             FROM events GROUP BY 1, 2),
           w AS (SELECT event_type, day, x,
               CAST(count(x) OVER win AS DOUBLE) AS n,
               CAST(sum(CAST(x AS DECIMAL(38,6))) OVER win AS DOUBLE) AS s,
               CAST(sum(CAST(x * x AS DECIMAL(38,6))) OVER win AS DOUBLE) AS ss
             FROM daily
             WINDOW win AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
           z AS (SELECT event_type, day, x, n,
               CASE WHEN sqrt(greatest(0.0, ss / n - (s / n) * (s / n))) > 0
                 THEN round((x - s / n) /
                   sqrt(greatest(0.0, ss / n - (s / n) * (s / n))), 6)
               END AS z
             FROM w)
           SELECT event_type, day, x AS value, CAST(n AS BIGINT) AS n_window,
             z, coalesce(abs(z) > 2.0, false) AS is_anomaly
           FROM z ORDER BY event_type, day"""))

  /** X100: exact EWMA ([[graft.operators.Series.ewmaHalf]]) — half-life
    * smoothing of per-type daily revenue as PURE INTEGER window math
    * (10^-4-unit scaling, power-of-two lag weights, one final
    * correctly-rounded division), so an inherently floating-point
    * recurrence hash-oracles exactly; the oracle is the same 8-term lag
    * chain, emitted from the shared constants.
    */
  val ewma = Q("q_ewma",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(dsum(col("value")).as("daily_total"))
      Series.ewmaHalf(daily, "event_type", "day", "daily_total",
          windowRows = 8)
        .orderBy(col("event_type"), col("day"))
    },
    Some {
      val terms = (0 until 8).map(i =>
        s"coalesce(lag(xq, $i) OVER win, 0) * ${1L << (7 - i)}")
        .mkString(" + ")
      s"""WITH daily AS (SELECT event_type,
           CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           ${dsumSql("value")} AS x
         FROM events GROUP BY 1, 2),
       q AS (SELECT event_type, day, x,
           CAST(round(x * 10000) AS BIGINT) AS xq FROM daily)
       SELECT event_type, day, x AS value,
         CAST($terms AS DOUBLE) / ${(1L << 8) * 10000L}.0 AS ewma
       FROM q
       WINDOW win AS (PARTITION BY event_type ORDER BY day)
       ORDER BY event_type, day"""
    })

  /** X68: l-diversity release audit
    * ([[graft.operators.DataQuality.lDiversity]]) — the companion to
    * q_k_anonymity: per (segment, nation) cell, how many DISTINCT
    * account-balance bands its customers span; a cell below l=3 would
    * publish its members' balance band even though the cell is large.
    */
  val lDiversityAudit = Q("q_l_diversity",
    (s, d) => DataQuality.lDiversity(customer(s, d),
        Seq("c_mktsegment", "c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("bigint"), l = 3L)
      .orderBy(col("c_mktsegment"), col("c_nationkey")),
    Some("""WITH fine AS (SELECT c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS sens,
             count(*) AS n
           FROM customer GROUP BY 1, 2, 3)
           SELECT c_mktsegment, c_nationkey, CAST(sum(n) AS BIGINT) AS n_rows,
             count(*) AS n_sensitive_values,
             count(*) >= 3 AS is_diverse
           FROM fine GROUP BY 1, 2 ORDER BY 1, 2"""))

  // md5 first-8-hex as a 32-bit integer — ONE definition with the
  // splitBucket/md5BucketSql family; `j` as the comprehension variable
  // so it nests under the weighted-sample oracle's outer `i`.
  private def hash32Sql(expr: String): String =
    NorthStarQueries.md5Hex8Sql(expr, v = "j")

  /** X69: deterministic weighted sampling
    * ([[graft.operators.TrainingData.weightedSample]]): 50 docs drawn
    * without replacement with odds ∝ a length-derived integer weight,
    * via integer min-of-w content hashes — no floats anywhere, so the
    * winner set is bit-stable and the oracle replays the exact
    * priorities.
    */
  val weightedSample = Q("q_weighted_sample",
    (s, d) => TrainingData.weightedSample(documents(s, d),
        weight = expr("n_chars div 100") + 1, k = 50)
      .orderBy(col("rank")),
    Some(s"""WITH base AS (SELECT doc_id, text,
             LEAST(GREATEST(COALESCE(n_chars // 100 + 1, 1), 1), 64)
               AS weight
           FROM documents
           WHERE text IS NOT NULL AND doc_id IS NOT NULL),
           pr AS (SELECT doc_id, weight,
             list_min([${hash32Sql("text || ':' || CAST(i AS VARCHAR)")}
               FOR i IN range(1, CAST(weight AS INT) + 1)]) AS priority
           FROM base)
           SELECT doc_id, CAST(weight AS BIGINT) AS weight, priority,
             CAST(row_number() OVER (ORDER BY priority, doc_id) AS INT)
               AS rank
           FROM pr ORDER BY priority, doc_id LIMIT 50"""))

  /** X70: character-class entropy quality score
    * ([[graft.functions.TextFunctions.classEntropy]]): Shannon entropy
    * of each document's lower/upper/digit/space/other distribution —
    * the cheap single-scan texture gate (all-caps, all-digit, filler
    * pages score near zero). Counts are integer-exact; the entropy terms
    * add in one fixed written order and round 6 for the libm-log2 ulp.
    */
  val charEntropy = Q("q_char_entropy",
    (s, d) => documents(s, d).select(col("doc_id"),
        TF.classCount(col("text"), "abcdefghijklmnopqrstuvwxyz").as("n_lower"),
        TF.classCount(col("text"), "ABCDEFGHIJKLMNOPQRSTUVWXYZ").as("n_upper"),
        TF.classCount(col("text"), "0123456789").as("n_digit"),
        TF.classCount(col("text"), " ").as("n_space"),
        round(TF.classEntropy(col("text")), 6).as("entropy"))
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
           (length(text) - length(translate(text,
             'abcdefghijklmnopqrstuvwxyz', ''))) AS n_lower,
           (length(text) - length(translate(text,
             'ABCDEFGHIJKLMNOPQRSTUVWXYZ', ''))) AS n_upper,
           (length(text) - length(translate(text, '0123456789', '')))
             AS n_digit,
           (length(text) - length(translate(text, ' ', ''))) AS n_space,
           round(${TF.classEntropySql("text")}, 6) AS entropy
           FROM documents ORDER BY doc_id"""))

  /** X72: dense-community mining on the co-ordered-parts graph (parts
    * linked when the same order contains both) via fixed-round k-core
    * peeling ([[graft.operators.Graphs.kCoreSurvivors]]): the 4-core
    * keeps products in densely cross-sold communities and peels away
    * incidental one-off co-occurrences — the association-mining
    * pre-filter run before any pairwise lift/affinity scoring, and the
    * same density gate a dedup pipeline runs on its candidate graph.
    * The subgraph is ABSOLUTE-bounded on the order-key range (the
    * audit-tier rule: co-occurrence graphs densify with scale, so a
    * proportional cap would go quadratic); the oracle replays the
    * identical peeling rounds as chained CTEs.
    */
  val basketCore = Q("q_basket_core",
    (s, d) => {
      val ps = lineitem(s, d).filter(col("l_orderkey") < 400)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = ps.as("x").join(ps.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("id_a"), col("y.l_partkey").as("id_b"))
        .distinct()
      graft.operators.Graphs.kCoreSurvivors(edges, k = 4, rounds = 4)
        .select(col("node").as("p_partkey"), col("deg").as("core_degree"))
        .orderBy(col("p_partkey"))
    },
    Some {
      def peel(i: Int, src: String) =
        s"""d$i AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
              SELECT u AS node FROM $src UNION ALL SELECT v FROM $src) t$i
              GROUP BY 1),
            n$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= 4)"""
      def induce(i: Int, src: String) =
        s"""e$i AS MATERIALIZED (SELECT $src.u, $src.v FROM $src
              JOIN n${i - 1} a ON $src.u = a.node
              JOIN n${i - 1} b ON $src.v = b.node)"""
      s"""WITH ps AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem WHERE l_orderkey < 400),
           e1 AS MATERIALIZED (SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
             FROM ps x JOIN ps y ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey),
           ${peel(1, "e1")},
           ${induce(2, "e1")}, ${peel(2, "e2")},
           ${induce(3, "e2")}, ${peel(3, "e3")},
           ${induce(4, "e3")}, ${peel(4, "e4")},
           ${induce(5, "e4")},
           df AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
             SELECT u AS node FROM e5 UNION ALL SELECT v FROM e5) tf
             GROUP BY 1)
           SELECT df.node AS p_partkey, df.deg AS core_degree
           FROM df JOIN n4 USING (node) ORDER BY p_partkey"""
    })

  /** X105: label-propagation communities
    * ([[graft.operators.Graphs.labelPropagation]]) on the
    * co-ordered-parts graph — synchronous, fixed 3 rounds,
    * most-frequent-neighbor label with smallest-label ties (the
    * deterministic variant of LPA; classic async is visit-order-
    * dependent and can't be oracled). Where connected components give
    * reachability, LPA separates dense clusters joined by thin
    * bridges. The oracle chains the identical rounds as materialized
    * CTEs: vote counts, (count DESC, label ASC) argmax, carry for
    * voteless nodes.
    */
  val communities = Q("q_communities",
    (s, d) => {
      val ps = lineitem(s, d).filter(col("l_orderkey") < 400)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = ps.as("x").join(ps.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("id_a"), col("y.l_partkey").as("id_b"))
        .distinct()
      val nodes = edges.select(col("id_a").as("node"))
        .unionByName(edges.select(col("id_b").as("node"))).distinct()
      graft.operators.Graphs.labelPropagation(nodes, edges, rounds = 3)
        .select(col("node").as("p_partkey"), col("label").as("community"))
        .orderBy(col("p_partkey"))
    },
    Some {
      def round(i: Int) =
        s"""c$i AS MATERIALIZED (
              SELECT es.v AS node, l.label AS nl, count(*) AS c
              FROM es JOIN l${i - 1} l ON es.u = l.node GROUP BY 1, 2),
            b$i AS MATERIALIZED (
              SELECT node, nl FROM (
                SELECT node, nl, row_number() OVER (PARTITION BY node
                  ORDER BY c DESC, nl ASC) AS rk FROM c$i) t WHERE rk = 1),
            l$i AS MATERIALIZED (
              SELECT l.node, coalesce(b.nl, l.label) AS label
              FROM l${i - 1} l LEFT JOIN b$i b ON l.node = b.node)"""
      s"""WITH ps AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem WHERE l_orderkey < 400),
           e1 AS MATERIALIZED (SELECT DISTINCT x.l_partkey AS u,
               y.l_partkey AS v
             FROM ps x JOIN ps y ON x.l_orderkey = y.l_orderkey
               AND x.l_partkey < y.l_partkey),
           es AS MATERIALIZED (SELECT u, v FROM e1
             UNION SELECT v, u FROM e1),
           l0 AS MATERIALIZED (SELECT node, node AS label FROM (
             SELECT u AS node FROM es UNION SELECT v FROM es) n),
           ${round(1)}, ${round(2)}, ${round(3)}
           SELECT node AS p_partkey, CAST(label AS BIGINT) AS community
           FROM l3 ORDER BY p_partkey"""
    })

  /** X73: grid-bucketed 2-D spatial join
    * ([[graft.operators.RangeJoin.pointInBox2D]]): customer points
    * against supplier delivery boxes on a deterministic 1000×1000
    * hash-coordinate plane — the geo-assignment shape (point-in-
    * polygon's axis-aligned core) that Spark would otherwise plan as a
    * nested loop over every (point, box) pair. Coordinates derive from
    * the md5-bucket family so the oracle replays them exactly and
    * verifies against the brute-force BETWEEN join.
    */
  val spatialJoin = Q("q_spatial_join",
    (s, d) => {
      def bucket(prefix: String, key: org.apache.spark.sql.Column, mod: Int) =
        TF.splitBucket(concat(lit(prefix), key.cast("string")), mod)
      val pts = customer(s, d).select(col("c_custkey"),
        bucket("px:", col("c_custkey"), 1000).as("px"),
        bucket("py:", col("c_custkey"), 1000).as("py"))
      val boxes = supplier(s, d).select(col("s_suppkey"),
          bucket("bx:", col("s_suppkey"), 950).as("x1"),
          bucket("by:", col("s_suppkey"), 950).as("y1"))
        .withColumn("x2", col("x1") + 10 + col("s_suppkey") % 40)
        .withColumn("y2", col("y1") + 10 + col("s_suppkey") % 30)
      graft.operators.RangeJoin.pointInBox2D(pts, boxes,
          "px", "py", "x1", "y1", "x2", "y2",
          cellWidth = 64, cellHeight = 64)
        .select(col("c_custkey"), col("s_suppkey"), col("px"), col("py"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    },
    Some(s"""WITH pts AS (SELECT c_custkey,
               ${NorthStarQueries.md5BucketSql("'px:' || CAST(c_custkey AS VARCHAR)", 1000)} AS px,
               ${NorthStarQueries.md5BucketSql("'py:' || CAST(c_custkey AS VARCHAR)", 1000)} AS py
             FROM customer),
           boxes AS (SELECT s_suppkey,
               ${NorthStarQueries.md5BucketSql("'bx:' || CAST(s_suppkey AS VARCHAR)", 950)} AS x1,
               ${NorthStarQueries.md5BucketSql("'by:' || CAST(s_suppkey AS VARCHAR)", 950)} AS y1
             FROM supplier),
           bx AS (SELECT s_suppkey, x1, y1,
               x1 + 10 + s_suppkey % 40 AS x2,
               y1 + 10 + s_suppkey % 30 AS y2
             FROM boxes)
           SELECT c_custkey, s_suppkey, px, py
           FROM pts JOIN bx
             ON px BETWEEN x1 AND x2 AND py BETWEEN y1 AND y2
           ORDER BY c_custkey, s_suppkey"""))

  /** X74: end-to-end entity resolution over the part-name vocabulary —
    * the MDM composition: fuzzy MATCH ([[EditDistanceJoin]], ed ≤ 2),
    * transitive CLUSTER ([[TrainingData.connectedComponents]] — count-
    * adaptive union-find), and SURVIVORSHIP (the spelling with the most
    * fact rows wins its cluster, ties to the oldest key). Every name
    * maps to its canonical form; the oracle replays match edges brute-
    * force, closes them with a recursive CTE, and applies the same
    * survivorship rule — three operators pinned as one composed result.
    */
  val entityResolution = Q("q_entity_resolution",
    (s, d) => {
      val names = part(s, d).groupBy(col("p_name").as("name"))
        .agg(min(col("p_partkey")).as("name_id"),
          count(lit(1)).as("n_rows"))
      val pairs = EditDistanceJoin.selfJoin(
        names.select(col("name")), "name", "name", k = 2)
      val edges = pairs
        .join(names.select(col("name").as("id_a"), col("name_id").as("ia")),
          "id_a")
        .join(names.select(col("name").as("id_b"), col("name_id").as("ib")),
          "id_b")
        .select(col("ia").as("id_a"), col("ib").as("id_b"))
      val comps = TrainingData.connectedComponents(
        names.select(col("name_id").as("doc_id")), edges)
      val labeled = names.join(comps,
        names("name_id") === comps("doc_id"))
      val canon = labeled.groupBy(col("component"))
        .agg(max_by(col("name"),
            struct(col("n_rows"), (-col("name_id")).as("_ni"))).as("canonical"),
          count(lit(1)).as("n_variants"))
      labeled.join(canon, "component")
        .select(col("name"), col("canonical"), col("n_variants"))
        .orderBy(col("name"))
    },
    Some("""WITH RECURSIVE n AS (SELECT p_name AS name,
             min(p_partkey) AS nid, count(*) AS n_rows
             FROM part GROUP BY 1),
           e AS MATERIALIZED (SELECT a.nid AS ia, b.nid AS ib
             FROM n a JOIN n b ON a.name < b.name
               AND abs(length(a.name) - length(b.name)) <= 2
               AND levenshtein(a.name, b.name) <= 2),
           sym AS MATERIALIZED (SELECT ia AS a, ib AS b FROM e
             UNION SELECT ib, ia FROM e),
           reach(a, b) AS (SELECT nid, nid FROM n
             UNION
             SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
           comp AS (SELECT a AS nid, min(b) AS component
             FROM reach GROUP BY 1),
           j AS (SELECT n.name, n.nid, n.n_rows, c.component
             FROM n JOIN comp c USING (nid)),
           k AS (SELECT component, name AS canonical,
               row_number() OVER (PARTITION BY component
                 ORDER BY n_rows DESC, nid) AS rk,
               count(*) OVER (PARTITION BY component) AS n_variants
             FROM j)
           SELECT j.name, k.canonical, k.n_variants
           FROM j JOIN k ON j.component = k.component AND k.rk = 1
           ORDER BY j.name"""))

  /** X66 keyed twin: per-entity gap-fill
    * ([[graft.operators.Series.interpolateDailyKeyed]]) — each event
    * type's own daily-revenue series is calendar-filled and interpolated
    * independently, every window PARTITIONED BY the key (no global sort
    * anywhere, unlike the intentionally-single-series q_interpolate).
    * SeriesSpec pins keyed-restricted-to-one-key ≡ single-series; the
    * oracle replays the per-key calendars as a lateral generate_series.
    */
  val interpolateKeyed = Q("q_interpolate_keyed",
    (s, d) => {
      val daily = events(s, d)
        .filter(col("user_id") % 50 === 3)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(dsum(col("value")).as("v"))
      Series.interpolateDailyKeyed(daily, "event_type", "day", "v")
        .orderBy(col("event_type"), col("day"))
    },
    Some(s"""WITH daily AS (SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               ${dsumSql("value")} AS v
             FROM events WHERE user_id % 50 = 3 GROUP BY 1, 2),
           b AS (SELECT event_type, min(day) AS lo, max(day) AS hi
             FROM daily GROUP BY 1),
           cal AS (SELECT event_type,
               CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                 AS day
             FROM b),
           j AS (SELECT c.event_type, c.day, dd.v FROM cal c
             LEFT JOIN daily dd USING (event_type, day)),
           w AS (SELECT event_type, day, v,
             last_value(v IGNORE NULLS) OVER pre AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER pre AS pd,
             first_value(v IGNORE NULLS) OVER post AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER post AS nd
             FROM j
             WINDOW pre AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               post AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           SELECT event_type, day, v IS NOT NULL AS observed,
             round(CASE WHEN v IS NOT NULL THEN v
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                 pv + (nv - pv) * (CAST(day - pd AS DOUBLE) /
                   CAST(nd - pd AS DOUBLE))
               WHEN pv IS NOT NULL THEN pv ELSE nv END, 6) AS value
           FROM w ORDER BY event_type, day"""))

  /** X77: market-basket association rules
    * ([[graft.operators.Baskets.associationRules]]) — pairwise
    * support/confidence/lift over order baskets with the a-priori
    * frequent-item prune BEFORE any pairing (the support threshold is
    * the scale bound; pair fan-out is per-basket, never inventory-wide).
    * Counts are exact integers; confidence/lift are single
    * correctly-rounded IEEE divisions of exact-integer doubles, so the
    * oracle replays them bit-for-bit; the top-k cut orders by the
    * integer count with a full tiebreak, so no float ranks the cut.
    */
  private val assocRulesOracle = """WITH b AS (SELECT DISTINCT l_orderkey AS basket,
               l_partkey AS item FROM lineitem),
           n AS (SELECT count(DISTINCT basket) AS n_baskets FROM b),
           ic AS (SELECT item, count(*) AS c_item FROM b
             GROUP BY 1 HAVING count(*) >= 2),
           q AS (SELECT b.basket, b.item FROM b JOIN ic USING (item)),
           pairs AS (SELECT x.item AS ia, y.item AS ib, count(*) AS n_both
             FROM q x JOIN q y ON x.basket = y.basket AND x.item < y.item
             GROUP BY 1, 2 HAVING count(*) >= 2),
           directed AS (SELECT ia AS antecedent, ib AS consequent, n_both
               FROM pairs
             UNION ALL
             SELECT ib, ia, n_both FROM pairs)
           SELECT d.antecedent, d.consequent, d.n_both,
             a.c_item AS n_ante, c.c_item AS n_cons,
             round(CAST(d.n_both AS DOUBLE) / a.c_item, 6) AS confidence,
             round((CAST(n.n_baskets AS DOUBLE) * d.n_both) /
               (CAST(a.c_item AS DOUBLE) * c.c_item), 6) AS lift
           FROM directed d
           JOIN ic a ON d.antecedent = a.item
           JOIN ic c ON d.consequent = c.item
           CROSS JOIN n
           ORDER BY n_both DESC, antecedent, consequent LIMIT 40"""

  val assocRules = Q("q_assoc_rules",
    (s, d) => Baskets.associationRules(lineitem(s, d), "l_orderkey",
      "l_partkey", minItemCount = 2, minPairCount = 2, topK = 40),
    Some(assocRulesOracle))

  /** X79: incrementally maintained association rules — the X33
    * merge ≡ recompute contract applied to the basket tier: item, pair,
    * and basket counts are ADDITIVE over disjoint whole-basket batches,
    * so batch 2's state folds into batch 1's via
    * [[graft.operators.IncrementalAgg.mergeRollup]] (rollup-sized state,
    * the fact history never rescanned) and rules re-derive from the
    * merged state. The oracle is VERBATIM q_assoc_rules' full-corpus
    * recompute, so passing pins incremental ≡ recompute exactly — the
    * deterministic parity split stands in for two crawl batches.
    */
  val incrementalAssoc = Q("q_incremental_assoc",
    (s, d) => {
      import graft.operators.IncrementalAgg
      val li = lineitem(s, d)
      // disjoint WHOLE baskets per batch (the soundness requirement):
      // split on the basket key itself
      val (i1, p1, n1) = Baskets.basketState(
        li.filter(col("l_orderkey") % 2 === 0), "l_orderkey", "l_partkey")
      val (i2, p2, n2) = Baskets.basketState(
        li.filter(col("l_orderkey") % 2 =!= 0), "l_orderkey", "l_partkey")
      val ic = IncrementalAgg.mergeRollup(i1, i2, Seq("item"), Seq("c_item"))
      val pc = IncrementalAgg.mergeRollup(p1, p2, Seq("ia", "ib"),
        Seq("n_both"))
      val nb = IncrementalAgg.mergeRollup(n1.withColumn("k", lit(1)),
        n2.withColumn("k", lit(1)), Seq("k"), Seq("n_baskets")).drop("k")
      Baskets.rulesFromState(ic, pc, nb, minItemCount = 2,
        minPairCount = 2, topK = 40)
    },
    Some(assocRulesOracle))

  /** X78: containment (subsumption) dedup
    * ([[graft.operators.Dedup.containmentPairs]]): pairs where one doc's
    * word-3-gram set is a SUBSET of another's — the quoted-in-full /
    * boilerplate-wrapped duplicate Jaccard banding under-scores when the
    * container is much longer. Candidates via the rarest-shingle probe
    * (complete — a container holds every contained shingle, including
    * the probe), exact intersection-count confirm. The candidate scheme
    * has no false negatives, so the oracle is simply BRUTE containment
    * over the whole corpus — passing pins completeness, not just
    * precision.
    */
  val containmentDedup = Q("q_containment_dedup",
    (s, d) => Dedup.containmentPairs(documents(s, d), "text", "doc_id")
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH docs AS (SELECT doc_id,
               string_split_regex(trim(text), '\s+') AS toks
             FROM documents),
           sh AS (SELECT DISTINCT doc_id,
               unnest([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                       FOR i IN range(greatest(len(toks) - 2, 0))])
                 AS shingle
             FROM docs),
           sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
           inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*) AS inter
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
             GROUP BY 1, 2)
           SELECT i.id_a, i.id_b, sa.sz AS sz_a, sb.sz AS sz_b
           FROM inter i
           JOIN sizes sa ON i.id_a = sa.doc_id
           JOIN sizes sb ON i.id_b = sb.doc_id
           WHERE i.inter = sa.sz AND sa.sz > 0
           ORDER BY id_a, id_b"""))

  /** X84: 2-D skyline (Pareto front) of user engagement — users no other
    * user beats on BOTH event count and distinct active days
    * ([[graft.operators.Skyline.skyline2D]]: grid-bucketed exact
    * dominance, no all-pairs join, no global sort — every fact-sized
    * window is partitioned by bucket). The oracle is the brute
    * NOT-EXISTS dominance definition, so passing pins the grid
    * decomposition exactly.
    */
  val skyline = Q("q_skyline",
    (s, d) => {
      val users = events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(to_date(col("ts"))).as("n_days"))
      graft.operators.Skyline.skyline2D(users, "n_events", "n_days")
        .orderBy(col("user_id"))
    },
    Some("""WITH u AS (SELECT user_id, count(*) AS n_events,
              count(DISTINCT CAST(ts AS DATE)) AS n_days
            FROM events GROUP BY 1)
          SELECT user_id, n_events, n_days FROM u p
          WHERE NOT EXISTS (SELECT 1 FROM u q
            WHERE q.n_events >= p.n_events AND q.n_days >= p.n_days
              AND (q.n_events > p.n_events OR q.n_days > p.n_days))
          ORDER BY user_id"""))

  val all: Seq[Q] = Seq(fuzzyNames, interpolate, interpolateKeyed, anomaly,
    ewma, lDiversityAudit, weightedSample, charEntropy, basketCore,
    communities, spatialJoin, entityResolution, assocRules,
    incrementalAssoc, containmentDedup, skyline)
}
