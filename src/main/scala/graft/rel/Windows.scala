package graft.rel

import graft.core.{D, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.E window functions + §2.F sorts/limits. Every window order includes
  * a unique tiebreak column (D1), and every ROWS/RANGE frame is explicit
  * on both engines — default frames with multi-column ORDER BY are a
  * cross-engine hazard. Window partition keys are the natural series keys
  * (user_id, c_custkey), so at scale each partition is small; no
  * whole-table single-partition windows anywhere.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = graft.core.Reg.uniqueMap(
    "win_row_number" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          row_number().over(w).cast("long").as("rn"))
        .orderBy("event_type", "rn")
    }),

    "win_rank_dense" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    }),

    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    }),

    "win_moving_avg_rows" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          D.r4s(sum(D.dec(col("o_totalprice"))).over(w).cast("double")
            / count(lit(1)).over(w)).as("mavg"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_sec")
        .rangeBetween(-3600, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_sec"),
          sum(D.dec(col("value"))).over(w).cast("double").as("trailing_1h"))
        .orderBy("user_id", "event_id")
    }),

    "win_cumsum" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          sum(D.dec(col("value"))).over(w).cast("double").as("cum_value"))
        .orderBy("user_id", "event_id")
    }),

    "win_first_last_value" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(w).as("last_v"))
        .orderBy("user_id", "event_id")
    }),

    "win_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "win_topk_pergroup" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // gap>30min sessionization: lag → new-session flag → running sum =
    // session id → per-session aggregate
    "win_sessionize" -> ((s, dir) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts_ms"), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("session_start"),
          max(col("ts_ms")).as("session_end"))
        .orderBy("user_id", "session_id")
    }),

    // gaps-and-islands longest streak: each user's distinct active-day
    // set; day − row_number is constant within a consecutive run, so
    // one groupBy per (user, run) then an arg-max per user (ties break
    // to the LATER start via the lexicographic struct max — mirrored by
    // the oracle's ORDER BY len DESC, start_day DESC). Both windows
    // partition by user over day-cardinality rows, never raw events.
    "win_streak" -> ((s, dir) => {
      val days = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ms DIV 86400000").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days.withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
        .groupBy("user_id")
        .agg(max(struct(col("len"), col("start_day"))).as("m"))
        .select(col("user_id"), col("m.len").as("streak_days"),
          col("m.start_day").as("start_day"))
        .orderBy("user_id")
    }),

    "win_percent_rank_cume" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
      Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"),
          D.r4s(percent_rank().over(w)).as("pr"),
          D.r4s(cume_dist().over(w)).as("cd"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    "sort_global" -> ((s, dir) =>
      Tables.events(s, dir)
        .select("event_id", "ts_ms", "event_type")
        .orderBy("ts_ms", "event_id")),

    "sort_multikey_nulls" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(asc_nulls_first("o_totalprice"), desc("c_custkey"),
          asc_nulls_first("o_orderkey"))),

    "limit_topk" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),

    // deterministic ~10% Bernoulli sample: keep rows whose md5(key) hex
    // prefix falls under a threshold. Hash-based sampling (not rand())
    // is the reproducible at-scale pattern — stable under retries,
    // partitioning, and engine — and makes the sample oracle-checkable.
    "limit_sample" -> ((s, dir) =>
      Tables.orders(s, dir)
        .where(substring(md5(col("o_orderkey").cast("string").cast("binary")), 1, 2) <= "19")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // nth_value over the full partition frame (the "second purchase"
    // shape; null for 1-order customers on both engines)
    "win_nth_value" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // rolling distinct count: Spark has no DISTINCT aggregates over
    // window frames, so the canonical form is size(collect_set) — the
    // set is bounded by the frame (5 rows) so per-row state is O(frame),
    // never O(partition); DuckDB's count(DISTINCT) OVER mirrors it
    "win_rolling_distinct" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        .rowsBetween(-4, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          size(collect_set(col("event_type")).over(w)).cast("long").as("n_types"))
        .orderBy("user_id", "event_id")
    })
  )

  val oracleSql: Map[String, String] = graft.core.Reg.uniqueMap(
    "win_row_number" ->
      """SELECT event_id, event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
         FROM events ORDER BY event_type, rn""",

    "win_rank_dense" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
            rank() OVER w AS rnk, dense_rank() OVER w AS drnk
         FROM lineitem WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""",

    "win_lag_lead" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000000 AS ts_ms FROM events)
         SELECT user_id, event_id, value,
            lag(value, 1) OVER w AS prev_value, lead(value, 1) OVER w AS next_value
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
         ORDER BY user_id, event_id""",

    "win_moving_avg_rows" ->
      """SELECT o_custkey, o_orderkey,
            ROUND((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
                  / COUNT(1) OVER w) * 10000.0, 0) / 10000.0 + 0.0 AS mavg
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",

    "win_range_frame" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000000000 AS ts_sec FROM events)
         SELECT user_id, event_id, ts_sec,
            CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS trailing_1h
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "win_cumsum" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000000 AS ts_ms FROM events)
         SELECT user_id, event_id,
            CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS cum_value
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "win_first_last_value" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000000 AS ts_ms FROM events)
         SELECT user_id, event_id,
            first_value(value) OVER w AS first_v, last_value(value) OVER w AS last_v
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_id""",

    "win_ntile" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
            ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile
         FROM customer ORDER BY c_mktsegment, c_custkey""",

    "win_topk_pergroup" ->
      """WITH r AS (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         SELECT o_custkey, rn, o_orderkey, o_totalprice FROM r
         WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "win_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         l AS (
           SELECT user_id, event_id, ts_ms,
                  lag(ts_ms, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ts
           FROM e),
         f AS (
           SELECT user_id, event_id, ts_ms,
                  CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000 THEN 1 ELSE 0 END AS new_sess
           FROM l),
         sid AS (
           SELECT user_id, ts_ms,
                  CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM f)
         SELECT user_id, session_id, count(1) AS n_events,
                min(ts_ms) AS session_start, max(ts_ms) AS session_end
         FROM sid GROUP BY 1, 2 ORDER BY 1, 2""",

    // mirror of win_streak: identical islands construction; the Spark
    // side's max(struct(len, start_day)) ≡ this rn=1 arg-max
    "win_streak" ->
      """WITH days AS (
           SELECT DISTINCT user_id, (epoch_ns(ts) // 1000000) // 86400000 AS day
           FROM events),
         isl AS (
           SELECT user_id, day,
                  day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
           FROM days),
         runs AS (
           SELECT user_id, grp, count(1) AS len, min(day) AS start_day
           FROM isl GROUP BY 1, 2),
         best AS (
           SELECT user_id, len, start_day,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY len DESC, start_day DESC) AS rn
           FROM runs)
         SELECT user_id, len AS streak_days, start_day
         FROM best WHERE rn = 1 ORDER BY user_id""",

    "win_percent_rank_cume" ->
      """SELECT c_mktsegment, c_custkey,
            ROUND(percent_rank() OVER w * 10000.0, 0) / 10000.0 + 0.0 AS pr,
            ROUND(cume_dist() OVER w * 10000.0, 0) / 10000.0 + 0.0 AS cd
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_mktsegment, c_custkey""",

    "sort_global" ->
      """SELECT event_id, epoch_ns(ts) // 1000000 AS ts_ms, event_type
         FROM events ORDER BY ts_ms, event_id""",

    "sort_multikey_nulls" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         ORDER BY o_totalprice ASC NULLS FIRST, c_custkey DESC, o_orderkey ASC NULLS FIRST""",

    "limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "limit_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '19'
         ORDER BY o_orderkey""",

    "win_nth_value" ->
      """SELECT o_custkey, o_orderkey,
            nth_value(o_totalprice, 2)
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS second_price
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "win_rolling_distinct" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_ns(ts) // 1000000 AS ts_ms FROM events)
         SELECT user_id, event_id, event_type,
                count(DISTINCT event_type)
                  OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_types
         FROM e ORDER BY user_id, event_id"""
  )
}
