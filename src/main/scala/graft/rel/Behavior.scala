package graft.rel

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over the `events` stream: ordered funnels
  * and cohort retention — the two classic product-analytics queries every
  * event warehouse serves.
  *
  * Scale shape: every stage is keyed on `user_id`, so each query is a
  * chain of user-hash-partitioned aggregates/joins — data volume after
  * the first aggregate is user-count-sized (orders of magnitude below the
  * raw event count), and all subsequent joins co-partition on the same
  * key so AQE can keep them shuffle-reuse-friendly. Nothing here ever
  * re-widens to per-event rows.
  */
object Behavior {
  type Q = (SparkSession, String) => DataFrame

  private val WeekMs = 7L * 86400000L

  val queries: Map[String, Q] = Map(
    // ordered conversion funnel view → click → purchase: a user counts
    // for stage k only if the stage-k event happens AT OR AFTER their
    // first stage-(k−1) event. Each stage is min-ts per user over a
    // filtered slice joined to the previous stage's user-sized frame —
    // the standard "first touch after" formulation, never a per-event
    // self-join.
    "evt_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir).select("user_id", "event_type", "ts_ms")
      // each stage frame is user-sized; materializing it keeps the raw
      // event scan count at one per stage (3), instead of re-deriving
      // earlier stages inside later ones (6 scans un-materialized)
      val v = graft.core.Exec.materialize(
        e.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_ms").as("t_view")))
      val c = graft.core.Exec.materialize(
        e.where(col("event_type") === "click")
          .join(v, "user_id").where(col("ts_ms") >= col("t_view"))
          .groupBy("user_id").agg(min("ts_ms").as("t_click")))
      val p = e.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts_ms") >= col("t_click"))
        .groupBy("user_id").agg(min("ts_ms").as("t_purchase"))
      val stage = (name: String, df: DataFrame) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      stage("1_view", v).unionAll(stage("2_click", c)).unionAll(stage("3_purchase", p))
        .orderBy("stage")
    }),

    // weekly cohort retention: cohort = a user's first active epoch-week;
    // a (cohort, offset) cell counts users active in cohort_week+offset.
    // The distinct (user, week) frame is built once (user×week-sized),
    // the cohort frame is its min-week aggregate, and the cell counts
    // come from one co-partitioned join + groupBy.
    "evt_retention_cohort" -> ((s, dir) => {
      val weeks = graft.core.Exec.materialize(Tables.events(s, dir)
        .select(col("user_id"), expr(s"ts_ms DIV $WeekMs").as("week"))
        .distinct())
      val cohort = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
      weeks.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "evt_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         v AS (SELECT user_id, min(ts_ms) AS t_view FROM e
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.ts_ms) AS t_click FROM e
               JOIN v ON e.user_id = v.user_id AND e.ts_ms >= v.t_view
               WHERE e.event_type = 'click' GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts_ms) AS t_purchase FROM e
               JOIN c ON e.user_id = c.user_id AND e.ts_ms >= c.t_click
               WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT stage, n_users FROM (
           SELECT '1_view' AS stage, count(*) AS n_users FROM v
           UNION ALL SELECT '2_click', count(*) FROM c
           UNION ALL SELECT '3_purchase', count(*) FROM p)
         ORDER BY stage""",

    "evt_retention_cohort" ->
      s"""WITH weeks AS (
            SELECT DISTINCT user_id,
                   (epoch_ns(ts) // 1000000) // ${7L * 86400000L} AS week
            FROM events),
          cohort AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY 1)
          SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
                 count(*) AS n_users
          FROM weeks w JOIN cohort c ON w.user_id = c.user_id
          GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
