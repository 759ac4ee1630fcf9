package graft.stream

import graft.core.D
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.I streaming operators, driven through real StreamingQueries and
  * hash-compared against batch-equivalence oracles (the driver harness is
  * batch-only; equivalence IS the correctness statement for these). */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "stream_tumbling" -> ((s, dir) => Ingest.tumbling(s, dir)),
    "stream_sliding" -> ((s, dir) => Ingest.sliding(s, dir)),
    "stream_session" -> ((s, dir) => Ingest.session(s, dir)),
    "stream_dedup" -> ((s, dir) => Ingest.dedup(s, dir)),
    "stream_static_join" -> ((s, dir) => Ingest.staticJoin(s, dir)),
    "stream_stateful_counter" -> ((s, dir) => Ingest.statefulCounter(s, dir)),
    "stream_foreachbatch_sink" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
      Ingest.ingestWithCatalog(s, dir, tmp)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "stream_tumbling" ->
      s"""SELECT event_type, (epoch_ns(ts) // 3600000000000) * 3600000 AS bucket_ms,
            count(*) AS n, ${D.oSumDec("value")} AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "stream_sliding" ->
      """WITH w AS (SELECT event_type,
            ((epoch_ns(ts) // 900000000000) - r.j) * 900000 AS start_ms
          FROM events, range(0, 4) r(j))
         SELECT event_type, start_ms, count(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY 1, 2""",

    // session_window gap semantics at µs precision: new session iff
    // gap >= 30 min (window end exclusive)
    "stream_session" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
                     epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         l AS (SELECT user_id, ts_us, ts_ms,
                 lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS prev
               FROM e),
         f AS (SELECT user_id, ts_ms, ts_us,
                 CASE WHEN prev IS NULL OR ts_us - prev >= 1800000000 THEN 1 ELSE 0 END AS ns
               FROM l),
         sid AS (SELECT user_id, ts_ms,
                   CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
                 FROM f)
         SELECT user_id, min(ts_ms) AS session_start, count(*) AS n_events
         FROM sid GROUP BY user_id, sid ORDER BY 1, 2""",

    "stream_dedup" ->
      "SELECT count(DISTINCT event_id) AS n FROM events",

    "stream_static_join" ->
      """SELECT e.event_id, e.user_id, c.c_name
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",

    "stream_foreachbatch_sink" ->
      """SELECT DISTINCT event_type AS metric, 'user=' || user_id AS tags_canonical
         FROM events ORDER BY 1, 2"""
  )
}
