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

  val all: Seq[Q] = Seq(eventsHourly, eventsSliding, eventsRecent,
    eventsSessions, eventsDedup, eventsAttribution, asofJoin, asofForward,
    exactDistinctUsers)
}
