package graft.stream

import graft.core.D
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.I streaming operators, driven through real StreamingQueries and
  * hash-compared against batch-equivalence oracles (the driver harness is
  * batch-only; equivalence IS the correctness statement for these). */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = graft.core.Reg.uniqueMap(
    "stream_source_files" -> ((s, dir) => Ingest.sourceFiles(s, dir)),
    "stream_tumbling" -> ((s, dir) => Ingest.tumbling(s, dir)),
    "stream_sliding" -> ((s, dir) => Ingest.sliding(s, dir)),
    "stream_session" -> ((s, dir) => Ingest.session(s, dir)),
    "stream_windowed_topk" -> ((s, dir) => Ingest.windowedTopK(s, dir)),
    "stream_ohlc" -> ((s, dir) => Ingest.ohlc(s, dir)),
    "stream_dedup" -> ((s, dir) => Ingest.dedup(s, dir)),
    "stream_static_join" -> ((s, dir) => Ingest.staticJoin(s, dir)),
    "stream_stream_join" -> ((s, dir) => Ingest.streamStreamJoin(s, dir)),
    "stream_stateful_counter" -> ((s, dir) => Ingest.statefulCounter(s, dir)),
    "stream_cdc_latest" -> ((s, dir) => Ingest.cdcLatest(s, dir)),
    "stream_scd2" -> ((s, dir) => Ingest.streamScd2(s, dir)),
    "stream_windowed_dau" -> ((s, dir) => Ingest.windowedDau(s, dir)),
    // hot/cold merged read (r18 — VERDICT r17 "what's missing" #2): a
    // real streaming landing of the recent tier + the batch cold store,
    // deliberately overlapping one day, seam-deduped hot-first, one
    // daily downsample across the seam; the oracle recomputes the read
    // from raw events alone — equality is the consistency statement.
    // Stable scratch dir wiped per run (the foreachbatch_sink contract:
    // leftover landings would change the hot tier).
    "stream_hot_cold_union" -> ((s, dir) => {
      val tmp = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_hotcold")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      java.nio.file.Files.createDirectories(tmp)
      Ingest.hotColdUnion(s, dir, tmp.toString)
    }),

    "stream_foreachbatch_sink" -> ((s, dir) => {
      // stable scratch dir, WIPED before each run: catalog upserts are
      // stateful, so leftover state from a previous run would change the
      // output (and a fresh temp dir per run leaked the state forever)
      val tmp = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_ingest")
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      java.nio.file.Files.createDirectories(tmp)
      Ingest.ingestWithCatalog(s, dir, tmp.toString)
    }),

    // collector validation: synthesize deterministic defects (every 3rd
    // point loses its ksid tag, every 5th gets a NaN value), run the real
    // validators, count survivors — the oracle mirrors the construction
    // analytically.
    "ingest_validate" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = graft.core.Tables.events(s, dir)
      val pts = ev.select(
        col("event_type").as("metric"),
        when(pmod(col("event_id"), lit(3)) === 0,
          map(lit("user"), col("user_id").cast("string")))
          .otherwise(map(lit("ksid"), lit("k0"), lit("user"), col("user_id").cast("string")))
          .as("tags"),
        col("ts_ms"),
        when(pmod(col("event_id"), lit(5)) === 0, lit(Double.NaN))
          .otherwise(col("value")).as("value"))
      Validate.validatePoints(pts)
        .groupBy("metric")
        .agg(count(lit(1)).as("n"),
          sum(col("is_valid").cast("long")).as("n_valid"),
          sum(col("ksid_ok").cast("long")).as("n_ksid_ok"),
          sum(col("value_ok").cast("long")).as("n_value_ok"))
        .orderBy("metric")
    })
  )

  val oracleSql: Map[String, String] = graft.core.Reg.uniqueMap(
    // read-back equivalence: the streaming file source must surface the
    // exact batch table (same ids, same ms derivation, same payloads)
    "stream_source_files" ->
      """SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms, user_id,
                event_type, value, props
         FROM events ORDER BY event_id""",

    "stream_tumbling" ->
      s"""SELECT event_type, (epoch_ns(ts) // 3600000000000) * 3600000 AS bucket_ms,
            count(*) AS n, ${D.oSumDec("value")} AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    // mirror of Ingest.ohlc ≡ the tsdb_ohlc oracle shape at the
    // (event_type, hour) grain
    "stream_ohlc" ->
      """WITH b AS (SELECT event_type,
                           (epoch_ns(ts) // 3600000000000) * 3600000 AS bucket_ms,
                           epoch_ns(ts) // 1000000 AS ts_ms, value
                    FROM events),
         o AS (SELECT event_type, bucket_ms, value,
                      row_number() OVER (PARTITION BY event_type, bucket_ms
                                         ORDER BY ts_ms, value) AS rn_o,
                      row_number() OVER (PARTITION BY event_type, bucket_ms
                                         ORDER BY ts_ms DESC, value DESC) AS rn_c
               FROM b),
         g AS (SELECT event_type, bucket_ms, max(value) AS high,
                      min(value) AS low, count(*) AS n
               FROM b GROUP BY 1, 2)
         SELECT g.event_type, g.bucket_ms, oo.value AS open, g.high, g.low,
                cc.value AS close, g.n
         FROM g
         JOIN o oo ON oo.event_type = g.event_type
                  AND oo.bucket_ms = g.bucket_ms AND oo.rn_o = 1
         JOIN o cc ON cc.event_type = g.event_type
                  AND cc.bucket_ms = g.bucket_ms AND cc.rn_c = 1
         ORDER BY 1, 2""",

    // mirror of Ingest.windowedTopK: tumbling counts then the same
    // (n desc, event_type) per-window rank
    "stream_windowed_topk" ->
      """WITH c AS (SELECT (epoch_ns(ts) // 3600000000000) * 3600000 AS bucket_ms,
                           event_type, count(*) AS n
                    FROM events GROUP BY 1, 2),
         r AS (SELECT bucket_ms, event_type, n,
                      row_number() OVER (PARTITION BY bucket_ms
                                         ORDER BY n DESC, event_type) AS rnk
               FROM c)
         SELECT bucket_ms, event_type, n, rnk FROM r
         WHERE rnk <= 3 ORDER BY bucket_ms, rnk""",

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

    // batch equivalence of the flatMapGroupsWithState counter (single
    // AvailableNow batch → per-user (ts, value) order, first row and
    // resets yield NULL delta)
    "stream_stateful_counter" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms, value
                    FROM events WHERE event_type = 'purchase'),
         l AS (SELECT user_id, ts_ms, value,
                 lag(value) OVER (PARTITION BY user_id ORDER BY ts_ms, value) AS pv
               FROM e)
         SELECT user_id, ts_ms, value,
                CASE WHEN pv IS NULL OR value < pv THEN NULL ELSE value - pv END AS delta
         FROM l ORDER BY user_id, ts_ms, value""",

    // batch equivalence of the streamed SCD2: the batch history build
    // restricted to CLOSED intervals (append mode cannot retract the
    // open ones — they live in the state store)
    "stream_scd2" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms, event_id,
                      json_extract_string(props, '$.k')::BIGINT AS k
                    FROM events
                    WHERE json_extract_string(props, '$.k') IS NOT NULL),
         c AS (SELECT *, lag(k) OVER (PARTITION BY user_id
                                      ORDER BY ts_ms, event_id) AS prev_k
               FROM e),
         ch AS (SELECT * FROM c WHERE prev_k IS NULL OR prev_k <> k),
         v AS (SELECT user_id, event_id, k, ts_ms AS valid_from,
                 lead(ts_ms) OVER (PARTITION BY user_id
                                   ORDER BY ts_ms, event_id) - 1 AS valid_to
               FROM ch)
         SELECT user_id, event_id, k, valid_from, valid_to
         FROM v WHERE valid_to IS NOT NULL
         ORDER BY user_id, valid_from, event_id""",

    // batch equivalence of the streamed dedup + finalized count
    "stream_windowed_dau" ->
      """SELECT ((epoch_ns(ts) // 1000000) // 3600000) * 3600000 AS bucket_ms,
                count(DISTINCT user_id) AS dau
         FROM events GROUP BY 1 ORDER BY 1""",

    // batch equivalence of the CDC latest-per-key snapshot: the struct
    // max ≡ the (ts desc, event_id desc, value desc) rn=1 arg-max
    "stream_cdc_latest" ->
      """WITH e AS (SELECT user_id, event_type, event_id, value,
                           epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         r AS (SELECT user_id, event_type, ts_ms, event_id, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                   ORDER BY ts_ms DESC, event_id DESC, value DESC) AS rn
               FROM e)
         SELECT user_id, event_type, ts_ms, event_id, value
         FROM r WHERE rn = 1 ORDER BY user_id, event_type""",

    "stream_static_join" ->
      """SELECT e.event_id, e.user_id, c.c_name
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         ORDER BY e.event_id""",

    // the stream side truncates event time to ms before watermarking,
    // so this ms-granular batch join is the exact mirror
    "stream_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                      epoch_ns(ts) // 1000000 AS ts_ms FROM events)
         SELECT c.event_id AS c_id, v.event_id AS v_id, c.user_id,
                c.ts_ms AS c_ts_ms, v.ts_ms AS v_ts_ms
         FROM e c JOIN e v ON v.user_id = c.user_id
           AND c.event_type = 'click' AND v.event_type = 'view'
           AND v.ts_ms > c.ts_ms AND v.ts_ms <= c.ts_ms + 300000
         ORDER BY c_id, v_id""",

    "stream_foreachbatch_sink" ->
      """SELECT DISTINCT event_type AS metric, 'user=' || user_id AS tags_canonical
         FROM events ORDER BY 1, 2""",

    // the merged hot/cold read recomputed from the raw events alone:
    // per-key dedup (MAX(value) — cross-tier copies carry identical
    // values, so hot-priority collapses to the value max) then the
    // same daily decimal-avg downsample the engine runs across the seam
    "stream_hot_cold_union" ->
      """WITH pts AS (SELECT event_type, user_id,
                        epoch_ns(ts) // 1000000 AS ts_ms, MAX(value) AS value
                      FROM events GROUP BY 1, 2, 3)
         SELECT event_type, user_id,
           (ts_ms // 86400000) * 86400000 AS bucket_ms,
           ROUND((CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value)) * 10000.0, 0) / 10000.0 + 0.0 AS value
         FROM pts GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "ingest_validate" ->
      """SELECT event_type AS metric, count(*) AS n,
            CAST(SUM(CASE WHEN event_id % 3 <> 0 AND event_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
            CAST(SUM(CASE WHEN event_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ksid_ok,
            CAST(SUM(CASE WHEN event_id % 5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_value_ok
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}
