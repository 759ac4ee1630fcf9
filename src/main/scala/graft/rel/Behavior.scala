package graft.rel

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  private val DayMs = 86400000L

  val queries: Map[String, Q] = graft.core.Reg.uniqueMap(
    // As-of dimension enrichment WITHOUT a join — the scalable
    // alternative to point-in-interval lookups against the SCD2
    // history: interleave fact and dimension-change rows in ONE
    // user-partitioned window pass and forward-fill the last change
    // (last(..., ignoreNulls) over rows-unbounded-preceding). Here
    // each click event is enriched with the k attribute of the user's
    // most recent PURCHASE (null before the first one). One sort
    // shuffle on the user key, zero joins, no per-user interval
    // blow-up — at 100 TB this wins over the range join whenever facts
    // and changes share a partitioning key.
    "evt_asof_enrich" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val e = Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .where(col("event_type").isin("click", "purchase"))
        .select("user_id", "ts_ms", "event_id", "event_type", "k")
      e.withColumn("k_asof",
          last(when(col("event_type") === "purchase", col("k")),
            ignoreNulls = true).over(w))
        .where(col("event_type") === "click")
        .select("user_id", "event_id", "ts_ms", "k_asof")
        .orderBy("user_id", "ts_ms", "event_id")
    }),

    // New vs returning users per day — the first-seen split every
    // product dashboard opens with: one min(day) per user (the
    // user-keyed aggregate), broadcast-joined back into the distinct
    // (user, day) frame. Both frames are user-count-sized; the raw
    // event scan reduces immediately.
    "evt_new_vs_returning" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ms DIV 86400000").as("day"))
        .distinct()
      val firstDay = e.groupBy("user_id").agg(min(col("day")).as("first_day"))
      e.join(firstDay, "user_id")
        .groupBy("day")
        .agg(sum(when(col("day") === col("first_day"), 1).otherwise(0))
            .cast("long").as("new_users"),
          sum(when(col("day") =!= col("first_day"), 1).otherwise(0))
            .cast("long").as("returning_users"))
        .orderBy("day")
    }),

    // Peak concurrency by sweep-line — "how many sessions were open at
    // once": sessionize (the win_sessionize 30-min-gap convention),
    // CLIP each session at day boundaries (one ±1 boundary pair per
    // day spanned — a session crossing midnight contributes to every
    // day it overlaps, so the per-day peak is the TRUE daily peak, not
    // just among sessions starting that day), and take the max running
    // sum per day. n_sessions = sessions ACTIVE (overlapping) that
    // day. The classic interval-stacking problem without an interval ×
    // interval self-join: ≤2 rows per session-day, one day-partitioned
    // sort window. Ties sort starts (+1) before ends (−1), so a
    // session ending exactly when another starts counts as overlap
    // (inclusive semantics, mirrored by the oracle). At 100 TB: the
    // sessionize window is user-partitioned, the sweep window
    // day-partitioned — two bounded sorts, never a quadratic overlap
    // join; the day-explode is bounded by session span in days.
    "evt_concurrency_peak" -> ((s, dir) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts_ms"), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(min(col("ts_ms")).as("s_ms"), max(col("ts_ms")).as("e_ms"))
        .withColumn("day",
          explode(sequence(expr("s_ms DIV 86400000"), expr("e_ms DIV 86400000"))))
        .withColumn("cs", greatest(col("s_ms"), col("day") * 86400000L))
        .withColumn("ce", least(col("e_ms"), (col("day") + 1) * 86400000L))
      val bounds = sess
        .select(col("user_id"), col("day"), col("cs").as("t"), lit(1).as("delta"))
        .unionByName(sess
          .select(col("user_id"), col("day"), col("ce").as("t"), lit(-1).as("delta")))
      val wSweep = Window.partitionBy("day")
        .orderBy(col("t"), col("delta").desc, col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds.withColumn("open", sum(col("delta")).over(wSweep))
        .groupBy("day")
        .agg(max(col("open")).as("peak_concurrent"),
          sum(when(col("delta") === 1, 1).otherwise(0)).cast("long").as("n_sessions"))
        .orderBy("day")
    }),

    // Slowly-changing-dimension type-2 history build (the classic
    // warehouse CDC shape): treat the event stream as a change log of
    // each user's `k` attribute (parsed from JSON props) and emit one
    // validity interval per change — valid_from at the change event,
    // valid_to just before the next change, open interval flagged
    // current. All work runs in ONE user-partitioned window pass
    // (lag to detect changes, lead over the filtered change rows for
    // interval ends) — per-user state, no self-joins; at 100 TB this
    // is a single hash-partition-by-key sort-within-partitions shape.
    "cdc_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val e = Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .where(col("k").isNotNull)
        .select("user_id", "ts_ms", "event_id", "k")
      e.withColumn("prev_k", lag(col("k"), 1).over(w))
        .where(col("prev_k").isNull || col("prev_k") =!= col("k"))
        .withColumn("valid_to", lead(col("ts_ms"), 1).over(w) - 1)
        .select(col("user_id"), col("event_id"), col("k"),
          col("ts_ms").as("valid_from"), col("valid_to"),
          when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
        .orderBy("user_id", "valid_from", "event_id")
    }),

    // Hourly VWAP (volume-weighted average price) per event type, with
    // the weight parsed out of the JSON props payload — the
    // weighted-aggregate-over-semi-structured shape (ad pricing, trade
    // tapes, metered billing). JSON extraction is map-side codegen
    // (get_json_object), the only exchange is the (type, hour)
    // partial→final aggregate, and the weighted sum carries decimal
    // quantization so the ratio is order-independent.
    "evt_vwap" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("w", get_json_object(col("props"), "$.k").cast("long"))
        .where(col("w").isNotNull && col("w") > 0)
      e.groupBy(col("event_type"),
          (col("ts_ms") - pmod(col("ts_ms"), lit(3600000L))).as("hour_ms"))
        .agg(sum(col("w")).as("volume"),
          graft.core.D.r4s(
            sum(graft.core.D.dec(col("value") * col("w"))).cast("double") /
              sum(col("w"))).as("vwap"))
        .orderBy("event_type", "hour_ms")
    }),

    // RFM segmentation (recency / frequency / monetary) — the classic
    // customer-scoring rollup. All window work runs over the REDUCED
    // per-user frame (one row per purchaser), never events; scores are
    // ntile(4) with a user_id tie-break — all-integer quartile logic,
    // engine-portable where interpolated thresholds would not be. (At
    // extreme user counts the unpartitioned ntile is a single-reducer
    // sort; the drop-in scale fix is scoring against three broadcast
    // quantile thresholds — same labels, no global window.)
    "evt_rfm" -> ((s, dir) => {
      val e = Tables.events(s, dir).where(col("event_type") === "purchase")
      val u = e.groupBy("user_id")
        .agg(max("ts_ms").as("t_last"),
          count(lit(1)).as("frequency"),
          graft.core.D.r4s(sum(graft.core.D.dec(col("value"))).cast("double"))
            .as("monetary"))
        .withColumn("recency_d",
          expr(s"(${Tables.NowMs} - t_last) DIV $DayMs"))
      val rs = ntile(4).over(Window.orderBy(col("recency_d"), col("user_id")))
      val fs = ntile(4).over(Window.orderBy(col("frequency").desc, col("user_id")))
      val ms = ntile(4).over(Window.orderBy(col("monetary").desc, col("user_id")))
      u.select(col("user_id"), col("recency_d"), col("frequency"), col("monetary"),
          rs.as("r_score"), fs.as("f_score"), ms.as("m_score"))
        .withColumn("segment", concat(col("r_score").cast("string"),
          col("f_score").cast("string"), col("m_score").cast("string")))
        .orderBy("user_id")
    }),

    // session-length distribution: 30-min-gap sessionization (the
    // win_sessionize islands) collapsed to a session-duration frame,
    // then ONE reduced row of exact interpolated quartiles — windows
    // stay user-partitioned, the percentile state is session-count
    // bounded (far below events).
    "evt_session_quartiles" -> ((s, dir) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sessions = Tables.events(s, dir)
        .select("user_id", "event_id", "ts_ms")
        .withColumn("prev_ts", lag(col("ts_ms"), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > 1800000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg((max("ts_ms") - min("ts_ms")).as("dur_ms"),
          count(lit(1)).as("n_events"))
      sessions.agg(count(lit(1)).as("n_sessions"),
        graft.core.D.r4s(expr("percentile(dur_ms, 0.25)")).as("p25_ms"),
        graft.core.D.r4s(expr("percentile(dur_ms, 0.5)")).as("p50_ms"),
        graft.core.D.r4s(expr("percentile(dur_ms, 0.75)")).as("p75_ms"),
        graft.core.D.r4s(sum(col("n_events")).cast("double") /
          count(lit(1)).cast("double")).as("mean_events"))
    }),

    // A/B experiment readout: arm = user_id parity (the deterministic
    // id-hash split every experiment system uses), conversion = the
    // user has ≥1 purchase. One user-sized aggregate, then ONE row of
    // conditional counts; the lift divides the two ALREADY-4dp
    // conversion rates so the ratio adds no new float surface.
    "evt_ab_lift" -> ((s, dir) => {
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
        .withColumn("arm", pmod(col("user_id"), lit(2)))
      val cnt = (a: Int) => sum(when(col("arm") === a, 1).otherwise(0))
      val conv = (a: Int) => sum(when(col("arm") === a, col("conv")).otherwise(0))
      u.agg(cnt(0).as("n_a"), conv(0).as("conv_a"),
          cnt(1).as("n_b"), conv(1).as("conv_b"))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          graft.core.D.r4s(col("conv_a").cast("double") / col("n_a").cast("double")).as("cvr_a"),
          graft.core.D.r4s(col("conv_b").cast("double") / col("n_b").cast("double")).as("cvr_b"))
        .withColumn("lift",
          graft.core.D.r4s(col("cvr_b") / col("cvr_a") - lit(1.0)))
    }),

    // CUPED-adjusted experiment readout (Deng et al., WSDM'13) — the
    // variance-reduction standard: adjust each user's post-period
    // outcome by their PRE-period covariate, y_adj = y − θ(x − x̄),
    // θ = cov(x,y)/var(x). Pre/post split at the corpus time midpoint
    // (1-row broadcast), x = pre-period event count, y = post-period
    // purchase count, arm = user parity. θ comes from EXACT integer
    // sufficient statistics (n·Σxy − Σx·Σy over n·Σx² − (Σx)²; at
    // 100 TB the BIGINT sums become DECIMAL(38,0) — same one-pass
    // shape), quantized 4dp once; every downstream mean is r4 of an
    // exact-integer ratio, so the adjusted means add no float surface
    // beyond the house rule. The user frame is computed once and
    // shared by the stats and arm aggregates.
    "evt_cuped_lift" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "ts_ms", "event_type")
      val mid = ev.agg(expr("min(ts_ms) + (max(ts_ms) - min(ts_ms)) DIV 2").as("mid"))
      val u = graft.core.Exec.materialize(ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("ts_ms") < col("mid"), 1L).otherwise(0L)).as("x"),
          sum(when(col("ts_ms") >= col("mid") &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        .withColumn("arm", pmod(col("user_id"), lit(2))))
      val st = u.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(
          graft.core.D.r4s(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("theta"),
          graft.core.D.r4s(col("sx").cast("double") / col("n").cast("double")).as("mx"))
      val meanY = graft.core.D.r4s(col("ay").cast("double") / col("n_u").cast("double"))
      val meanX = graft.core.D.r4s(col("ax").cast("double") / col("n_u").cast("double"))
      u.groupBy("arm")
        .agg(count(lit(1)).as("n_u"), sum("x").as("ax"), sum("y").as("ay"))
        .crossJoin(broadcast(st))
        .select(col("arm"), col("n_u"), col("theta"),
          meanY.as("mean_y"),
          graft.core.D.r4s(meanY - col("theta") * (meanX - col("mx")))
            .as("mean_y_adj"))
        .orderBy("arm")
    }),

    // Sample-ratio-mismatch (SRM) check — the experiment-health gate
    // every A/B readout should run first: per day, the active-user
    // counts per arm vs the expected 50/50 split, scored by the
    // 1-df chi-square statistic and flagged at the 0.05 critical
    // value (3.8415). A flagged day means assignment or logging is
    // broken and the lift numbers can't be trusted. One distinct
    // user-day aggregate then a day-sized frame; the chi2 is r4 of
    // exact-integer-derived doubles.
    "evt_ab_srm" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .select(col("user_id"), expr(s"ts_ms DIV $DayMs").as("day")).distinct()
      val per = d.groupBy("day").agg(
        sum(when(pmod(col("user_id"), lit(2)) === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(pmod(col("user_id"), lit(2)) === 1, 1L).otherwise(0L)).as("n_b"))
      val e = (col("n_a") + col("n_b")).cast("double") / lit(2.0)
      per.select(col("day"), col("n_a"), col("n_b"),
          graft.core.D.r4s(
            (col("n_a").cast("double") - e) * (col("n_a").cast("double") - e) / e +
            (col("n_b").cast("double") - e) * (col("n_b").cast("double") - e) / e)
            .as("chi2"))
        .withColumn("srm", col("chi2") > lit(3.8415))
        .orderBy("day")
    }),

    // Kaplan–Meier survival curve for time-to-churn — THE
    // right-censoring-aware retention statistic (naive churn rates
    // understate survival when observation windows are cut short).
    // Duration = weeks between a user's first and last active day;
    // the event (churn) is observed iff the user has been silent ≥ 28
    // days at corpus end, otherwise the duration is censored. Per
    // week t: d_t churns among n_t at risk (everyone with duration
    // ≥ t — censored users leave the risk set after their last week,
    // which is the whole point of KM), S(t) = Π_{u≤t}(1 − d_u/n_u).
    // Everything to the weekly frame is user-sized aggregates; the
    // weekly frame itself is TIME-span-sized (corpus weeks, a data
    // constant independent of volume), so the global desc-cumsum
    // window and the per-prefix product fold — the established
    // portable-double-chain pattern (tsdb_holt) with one r4 at the
    // end — run over dozens of rows at any corpus scale.
    "evt_survival_km" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .select(col("user_id"), expr(s"ts_ms DIV $DayMs").as("day"))
      val u = d.groupBy("user_id")
        .agg(min("day").as("first_day"), max("day").as("last_day"))
      val mx = u.agg(max("last_day").as("corpus_last"))
      val wk = u.crossJoin(broadcast(mx))
        .select(expr("(last_day - first_day) DIV 7").as("t"),
          when(col("corpus_last") - col("last_day") >= 28, 1L)
            .otherwise(0L).as("churned"))
        .groupBy("t")
        .agg(sum("churned").as("d"), count(lit(1)).as("obs"))
      val wRisk = Window.orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = wk.withColumn("n_risk", sum(col("obs")).over(wRisk))
        .withColumn("f",
          lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
      val arr = risk.agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("obs"), col("n_risk"), col("f")))).as("pts"))
      val fs = transform(col("pts"), p => p.getField("f"))
      val folded = transform(col("pts"), (p, i) =>
        struct(p.getField("t").as("t"), p.getField("d").as("d"),
          p.getField("obs").as("obs"), p.getField("n_risk").as("n_risk"),
          aggregate(slice(fs, lit(1), i + lit(1)), lit(1.0),
            (acc, x) => acc * x, acc => graft.core.D.r4s(acc)).as("surv")))
      arr.select(explode(folded).as("e"))
        .select(col("e.t").as("week"), col("e.n_risk").as("n_risk"),
          col("e.d").as("n_churned"),
          (col("e.obs") - col("e.d")).as("n_censored"),
          col("e.surv").as("survival"))
        .orderBy("week")
    }),

    // week-over-week churn: of week-w actives, who has NO week-w+1
    // activity. One distinct aggregate + one self-join co-partitioned
    // on user_id; every frame is user×week-sized. Weeks without a
    // successor week in the data are excluded (their churn is
    // right-censored, not 100%).
    "evt_churn_weekly" -> ((s, dir) => {
      val weeks = graft.core.Exec.materialize(Tables.events(s, dir)
        .select(col("user_id"), expr(s"ts_ms DIV $WeekMs").as("week"))
        .distinct())
      val act = weeks.groupBy("week").agg(count(lit(1)).as("n_active"))
      val nxt = weeks.select(col("user_id"), (col("week") - 1).as("week"))
      val ret = weeks.join(nxt, Seq("user_id", "week")).groupBy("week")
        .agg(count(lit(1)).as("n_retained"))
      val grid = weeks.select("week").distinct()
      val hasNext = grid.join(grid.select((col("week") - 1).as("week")),
        Seq("week"), "left_semi")
      val retained = coalesce(col("n_retained"), lit(0L))
      act.join(hasNext, Seq("week"), "left_semi")
        .join(ret, Seq("week"), "left")
        .select(col("week"), col("n_active"),
          retained.as("n_retained"),
          (col("n_active") - retained).as("n_churned"),
          graft.core.D.r4s((col("n_active") - retained).cast("double") /
            col("n_active").cast("double")).as("churn_rate"))
        .orderBy("week")
    }),
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

    // windowed conversion funnel — evt_funnel with the constraint real
    // funnels always carry: each stage must land within 7 days of the
    // previous stage's first touch (an eventual conversion months later
    // is NOT attributable). Same user-keyed min-ts-per-stage chain; the
    // window bound also caps the join range at scale.
    "evt_funnel_window" -> ((s, dir) => {
      val wnd = 7L * 86400000L
      val e = Tables.events(s, dir).select("user_id", "event_type", "ts_ms")
      val v = graft.core.Exec.materialize(
        e.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_ms").as("t_view")))
      val c = graft.core.Exec.materialize(
        e.where(col("event_type") === "click")
          .join(v, "user_id")
          .where(col("ts_ms") >= col("t_view") &&
            col("ts_ms") <= col("t_view") + lit(wnd))
          .groupBy("user_id").agg(min("ts_ms").as("t_click")))
      val p = e.where(col("event_type") === "purchase")
        .join(c, "user_id")
        .where(col("ts_ms") >= col("t_click") &&
          col("ts_ms") <= col("t_click") + lit(wnd))
        .groupBy("user_id").agg(min("ts_ms").as("t_purchase"))
      val stage = (name: String, df: DataFrame) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("stage"), col("n_users"))
      stage("1_view", v).unionAll(stage("2_click", c))
        .unionAll(stage("3_purchase", p))
        .orderBy("stage")
    }),

    // stickiness (DAU/MAU per day): the engagement-ratio staple. Same
    // day-grid range join as evt_wau_rolling at the 30-day window; the
    // ratio is ONE division over exact integer counts
    "evt_stickiness" -> ((s, dir) => {
      val days = graft.core.Exec.materialize(Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ms DIV 86400000").as("day"))
        .distinct())
      val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
      val grid = days.select(col("day").as("d")).distinct()
      val mau = grid.join(days, col("day").between(col("d") - 29, col("d")))
        .groupBy("d").agg(countDistinct("user_id").as("mau"))
      dau.join(mau, col("day") === col("d"))
        .select(col("day"), col("dau"), col("mau"),
          graft.core.D.r4s(col("dau").cast("double") / col("mau").cast("double"))
            .as("stickiness"))
        .orderBy("day")
    }),

    // time-to-convert distribution: for users whose first purchase
    // follows their first view, the view→purchase delay quartiles —
    // one global row off user-sized frames (exact interpolated
    // percentiles, state bounded by converted-user count)
    "evt_conversion_time" -> ((s, dir) => {
      val e = Tables.events(s, dir).select("user_id", "event_type", "ts_ms")
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_ms").as("t_view"))
      val p = e.where(col("event_type") === "purchase")
        .join(v, "user_id").where(col("ts_ms") >= col("t_view"))
        .groupBy("user_id").agg(min("ts_ms").as("t_purchase"),
          min("t_view").as("t_view"))
      p.select((col("t_purchase") - col("t_view")).as("delta_ms"))
        .agg(count(lit(1)).as("n_converted"),
          graft.core.D.r4s(expr("percentile(delta_ms, 0.25)")).as("p25_ms"),
          graft.core.D.r4s(expr("percentile(delta_ms, 0.5)")).as("p50_ms"),
          graft.core.D.r4s(expr("percentile(delta_ms, 0.9)")).as("p90_ms"))
    }),

    // forward as-of: each signup joined to the user's NEXT purchase
    // (time-to-first-action). DuckDB's ASOF JOIN is backward-only, so
    // both engines express the forward probe as a min-over-future
    // struct aggregate on the co-partitioned user join
    "join_asof_forward" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val sgn = e.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"),
          col("ts_ms").as("s_ts"))
      val pur = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_ms").as("p_ts"),
          col("event_id").as("p_id"))
      sgn.join(pur, col("user_id") === col("p_user") &&
          col("p_ts") >= col("s_ts"), "left")
        .groupBy("signup_id", "user_id", "s_ts")
        .agg(min(when(col("p_ts").isNotNull,
          struct(col("p_ts"), col("p_id")))).as("m"))
        .select(col("signup_id"), col("user_id"), col("s_ts"),
          col("m.p_ts").as("next_purchase_ts"),
          col("m.p_id").as("next_purchase_id"))
        .orderBy("signup_id")
    }),

    // weekly cohort retention: cohort = a user's first active epoch-week;
    // a (cohort, offset) cell counts users active in cohort_week+offset.
    // The distinct (user, week) frame is built once (user×week-sized),
    // the cohort frame is its min-week aggregate, and the cell counts
    // come from one co-partitioned join + groupBy.
    // last-touch attribution: each purchase credited to the user's most
    // recent click/view in the preceding 7 days (ties at the same ms
    // take 'view' over 'click' via the lexicographic struct max; no
    // touch → 'none'). The touch join is co-partitioned on user_id, so
    // the range predicate only compares a user's own events.
    "evt_attribution" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_ms").as("p_ts"))
      val t = e.where(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_user"), col("ts_ms").as("t_ts"),
          col("event_type").as("channel"))
      p.join(t, col("user_id") === col("t_user") &&
          col("t_ts") <= col("p_ts") &&
          col("t_ts") > col("p_ts") - lit(7L * 86400000L), "left")
        .groupBy("purchase_id", "user_id", "p_ts")
        .agg(max(when(col("t_ts").isNotNull,
          struct(col("t_ts"), col("channel")))).as("m"))
        .select(col("purchase_id"), col("user_id"), col("p_ts"),
          coalesce(col("m.channel"), lit("none")).as("channel"),
          col("m.t_ts").as("touch_ts"))
        .orderBy("purchase_id")
    }),

    // Position-based (U-shaped) multi-touch attribution — the third
    // standard model next to last- and first-touch: each purchase
    // splits its credit 40% to the first touch, 40% to the last, and
    // 20% evenly across the middle of its 7-day touch path (n=1 → 1.0,
    // n=2 → 0.5 each), reported as total credit per channel. Same
    // co-partitioned user join as the single-touch models; the rank
    // and count come from ONE purchase-partitioned window pass, the
    // per-touch fractional credit is 4dp-quantized (the only ratio),
    // and channel totals are decimal sums. Per-purchase credits sum
    // to 1 up to 4dp rounding of the middle credit (0.2/(n−2) per
    // middle touch — for n where (n−2) doesn't divide 0.2 exactly,
    // e.g. n=5 → 3×0.0667 = 0.2001); the spec pins the sum within 1%.
    "evt_attribution_position" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_ms").as("p_ts"))
      val t = e.where(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_user"), col("ts_ms").as("t_ts"),
          col("event_id").as("t_id"), col("event_type").as("channel"))
      val touches = p.join(t, col("user_id") === col("t_user") &&
        col("t_ts") <= col("p_ts") &&
        col("t_ts") > col("p_ts") - lit(7L * 86400000L))
      val w = Window.partitionBy("purchase_id")
      val wAsc = w.orderBy(col("t_ts"), col("t_id"))
      val ranked = touches.withColumn("rn", row_number().over(wAsc))
        .withColumn("n", count(lit(1)).over(w))
      val credit = when(col("n") === 1, lit(1.0))
        .when(col("rn") === 1 || col("rn") === col("n"),
          when(col("n") === 2, lit(0.5)).otherwise(lit(0.4)))
        .otherwise(graft.core.D.r4s(lit(0.2) / (col("n") - 2).cast("double")))
      ranked.groupBy("channel")
        .agg(count(lit(1)).as("n_touches"),
          graft.core.D.r4s(sum(graft.core.D.dec(credit)).cast("double"))
            .as("credit"))
        .orderBy("channel")
    }),

    // first-touch attribution — the complement of evt_attribution's
    // last-touch: each purchase credited to the EARLIEST click/view in
    // the preceding 7 days (ties at the same ms take 'click' over
    // 'view' via the lexicographic struct min). Same co-partitioned
    // user join; only the arg direction differs.
    "evt_attribution_first" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val p = e.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_ms").as("p_ts"))
      val t = e.where(col("event_type").isin("click", "view"))
        .select(col("user_id").as("t_user"), col("ts_ms").as("t_ts"),
          col("event_type").as("channel"))
      p.join(t, col("user_id") === col("t_user") &&
          col("t_ts") <= col("p_ts") &&
          col("t_ts") > col("p_ts") - lit(7L * 86400000L), "left")
        .groupBy("purchase_id", "user_id", "p_ts")
        .agg(min(when(col("t_ts").isNotNull,
          struct(col("t_ts"), col("channel")))).as("m"))
        .select(col("purchase_id"), col("user_id"), col("p_ts"),
          coalesce(col("m.channel"), lit("none")).as("channel"),
          col("m.t_ts").as("touch_ts"))
        .orderBy("purchase_id")
    }),

    // rolling 7-day active users per day (the WAU dashboard staple):
    // day grid × distinct (user, day) range join — work is
    // days × active-(user,day) rows, never raw events
    "evt_wau_rolling" -> ((s, dir) => {
      val days = graft.core.Exec.materialize(Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ms DIV 86400000").as("day"))
        .distinct())
      val grid = days.select(col("day").as("d")).distinct()
      grid.join(days, col("day").between(col("d") - 6, col("d")))
        .groupBy("d")
        .agg(countDistinct("user_id").as("wau"))
        .select(col("d").as("day"), col("wau"))
        .orderBy("day")
    }),

    // Per-user event-type entropy — behavioral DIVERSITY (a user doing
    // only views scores 0; one spread evenly over all types scores
    // log₂|types|), the segmentation feature next to RFM's intensity
    // measures. Same dec10 per-term entropy chain as llm_char_entropy
    // (terms are O(p·log p), down at 1e-6 — DECIMAL(18,4) would crush
    // them): one (user, type) count aggregate, per-user window for p,
    // exact-decimal term sum, r4 at emission. User-sized frames only.
    "evt_type_entropy" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
      val c = Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).cast("double").as("cnt"))
      c.withColumn("p", col("cnt") / sum(col("cnt")).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_types"),
          sum(col("cnt")).cast("long").as("n_events"),
          graft.core.D.r4s(
            sum(graft.core.D.dec10(-col("p") * log2(col("p"))))
              .cast("double")).as("entropy"))
        .orderBy("user_id")
    }),

    // Gini coefficient of per-user activity, per event type — the
    // engagement-concentration scalar next to the Zipf exponent
    // (zipf fits the tail's shape; Gini summarizes the whole
    // inequality in [0,1]). Classic sorted-cumulative identity
    // G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over counts ranked ascending
    // (user_id tie-break): one user-level aggregate, one rank window
    // over the REDUCED frame, integer sums until the final two-term
    // double expression (multiplications cast to double first — the
    // n·Σx product overflows int64 at planetary scale). One r4.
    "evt_gini_activity" -> ((s, dir) => {
      val per = Tables.events(s, dir)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("cnt"), col("user_id"))
      per.withColumn("i", row_number().over(w))
        .groupBy("event_type").agg(
          count(lit(1)).as("n_users"),
          sum(col("cnt")).as("total"),
          sum(col("i").cast("long") * col("cnt")).as("iwsum"))
        .select(col("event_type"), col("n_users"), col("total"),
          graft.core.D.r4s(
            lit(2.0) * col("iwsum")
              / (col("n_users").cast("double") * col("total").cast("double"))
            - (col("n_users") + 1).cast("double") / col("n_users").cast("double"))
            .as("gini"))
        .orderBy("event_type")
    }),

    // Zipf/power-law fit of the user-activity distribution: OLS of
    // ln(count) on ln(rank) over the activity-ranked user frame — the
    // "how heavy-tailed is my traffic" diagnostic (slope ≈ −s, the
    // Zipf exponent). Every log is 4dp-decimal-quantized BEFORE the
    // sufficient-statistic sums so the fit is order-free; the window
    // ranks the REDUCED user frame. One user-sized pass, one row out.
    "evt_zipf_fit" -> ((s, dir) => {
      val u = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val ranked = u.withColumn("r",
        row_number().over(Window.orderBy(col("n").desc, col("user_id"))))
        .select(graft.core.D.dec(log(col("r").cast("double"))).as("lx"),
          graft.core.D.dec(log(col("n").cast("double"))).as("ly"))
      val st = ranked.agg(count(lit(1)).cast("double").as("m"),
        sum(col("lx")).cast("double").as("sx"),
        sum(col("ly")).cast("double").as("sy"),
        sum(col("lx") * col("lx")).cast("double").as("sxx"),
        sum(col("lx") * col("ly")).cast("double").as("sxy"))
      val slope = (col("m") * col("sxy") - col("sx") * col("sy")) /
        (col("m") * col("sxx") - col("sx") * col("sx"))
      st.select(col("m").cast("long").as("n_users"),
        graft.core.D.r4s(slope).as("slope"),
        graft.core.D.r4s((col("sy") - slope * col("sx")) / col("m"))
          .as("intercept"))
    }),

    // first-order Markov transition matrix over event types: consecutive
    // pairs per user from ONE lag window (per-user partitions), counted
    // per (prev, next) — the session-flow analytics shape; output is
    // |types|²-sized regardless of event volume
    "evt_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      Tables.events(s, dir)
        .select(col("event_type").as("next_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .where(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    }),

    // top-10 most-travelled 3-step event paths (sequence mining's
    // bread-and-butter): consecutive event-type trigrams per user from
    // ONE lead window (per-user partitions — a user's path never
    // crosses executors), counted map-side-partial into a
    // TakeOrderedAndProject. Output is |types|³-bounded regardless of
    // event volume; ties break lexicographically on the path string.
    "evt_path_topk" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .where(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    // cohort lifetime value: cumulative purchase revenue per signup
    // cohort by week offset, absolute and per cohort user. Revenue
    // cells are decimal-exact sums grouped on (cohort, offset); the
    // running LTV window then re-sums the ALREADY-4dp cells as
    // decimals (exact, order-free), so the cumulative column is
    // portable. Cohort sizes are cohort-count-sized → broadcast.
    "evt_cohort_ltv" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("week", expr(s"ts_ms DIV $WeekMs"))
      val cohort = graft.core.Exec.materialize(
        e.groupBy("user_id").agg(min("week").as("cohort_week")))
      val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
      val rev = e.where(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(graft.core.D.r4s(sum(graft.core.D.dec(col("value"))).cast("double"))
          .as("rev"))
      val w = Window.partitionBy("cohort_week").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.join(broadcast(sizes), "cohort_week")
        .withColumn("cum_rev",
          sum(graft.core.D.dec(col("rev"))).over(w).cast("double"))
        .select(col("cohort_week"), col("week_offset"), col("rev"),
          col("cum_rev"),
          graft.core.D.r4s(col("cum_rev") / col("n_users").cast("double"))
            .as("ltv_per_user"))
        .orderBy("cohort_week", "week_offset")
    }),

    "evt_retention_cohort" -> ((s, dir) => {
      val weeks = graft.core.Exec.materialize(Tables.events(s, dir)
        .select(col("user_id"), expr(s"ts_ms DIV $WeekMs").as("week"))
        .distinct())
      val cohort = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
      weeks.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // MATCH_RECOGNIZE-style sequence detection: per user, occurrences
    // of the strictly-consecutive pattern view → click → purchase
    // completing within 72 hours of the first step (the fixture's
    // per-user event cadence is ~10 h, so a minutes-scale bound would
    // make the detector vacuous at every sf). SQL-standard row
    // pattern matching compiles to exactly this shape for a
    // fixed-length pattern: ONE user-partitioned ordered window pass
    // with lead() materializing the next-k rows, a row filter for the
    // pattern predicate — no self-join, no per-event blow-up. The
    // per-user aggregate after the filter is user-count-sized. At
    // 100 TB the window sort is the only shuffle, on the same user
    // key every behavioral query here already partitions by.
    // (Variable-length patterns — A B* C — fold into the sessionize/
    // streak gaps-and-islands shape instead; this is the fixed-arity
    // fast path.)
    "evt_sequence_detect" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .withColumn("ts3", lead(col("ts_ms"), 2).over(w))
        .where(col("event_type") === "view" && col("t2") === "click" &&
          col("t3") === "purchase" && col("ts3") - col("ts_ms") <= lit(259200000L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_matches"), min(col("ts_ms")).as("first_start_ms"))
        .orderBy(col("n_matches").desc, col("user_id"))
    })
  )

  val oracleSql: Map[String, String] = graft.core.Reg.uniqueMap(
    // mirror of evt_sequence_detect: same user-ordered lead() triples,
    // same 72-h completion bound, same (ts_ms, event_id) tie order
    "evt_sequence_detect" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms,
                           event_id, event_type
                    FROM events),
         l AS (SELECT user_id, ts_ms, event_type,
                      lead(event_type, 1) OVER w AS t2,
                      lead(event_type, 2) OVER w AS t3,
                      lead(ts_ms, 2) OVER w AS ts3
               FROM e WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts_ms, event_id)),
         m AS (SELECT user_id, ts_ms FROM l
               WHERE event_type = 'view' AND t2 = 'click'
                 AND t3 = 'purchase' AND ts3 - ts_ms <= 259200000)
         SELECT user_id, count(*) AS n_matches,
                MIN(ts_ms) AS first_start_ms
         FROM m GROUP BY 1 ORDER BY n_matches DESC, user_id""",

    // mirror of evt_attribution_position: same 7-day touch join, same
    // window rank/count, same 4dp per-touch credit and decimal totals
    "evt_attribution_position" ->
      s"""WITH e AS (SELECT event_id, user_id,
                       epoch_ns(ts) // 1000000 AS ts_ms, event_type
                     FROM events),
          p AS (SELECT event_id AS purchase_id, user_id, ts_ms AS p_ts
                FROM e WHERE event_type = 'purchase'),
          t AS (SELECT user_id AS t_user, ts_ms AS t_ts,
                       event_id AS t_id, event_type AS channel
                FROM e WHERE event_type IN ('click', 'view')),
          touches AS (SELECT p.purchase_id, t.t_ts, t.t_id, t.channel
                      FROM p JOIN t ON t.t_user = p.user_id
                        AND t.t_ts <= p.p_ts
                        AND t.t_ts > p.p_ts - 604800000),
          ranked AS (SELECT channel,
                       row_number() OVER (PARTITION BY purchase_id
                                          ORDER BY t_ts, t_id) AS rn,
                       count(*) OVER (PARTITION BY purchase_id) AS n
                     FROM touches),
          cr AS (SELECT channel,
                   CASE WHEN n = 1 THEN 1.0
                        WHEN rn = 1 OR rn = n THEN
                          CASE WHEN n = 2 THEN 0.5 ELSE 0.4 END
                        ELSE ${graft.core.D.oR4(
                          "0.2 / CAST(n - 2 AS DOUBLE)")}
                   END AS credit
                 FROM ranked)
          SELECT channel, count(*) AS n_touches,
                 ${graft.core.D.oR4(graft.core.D.oSumDec("credit"))} AS credit
          FROM cr GROUP BY 1 ORDER BY channel""",

    // mirror of evt_new_vs_returning: same first-seen split
    "evt_new_vs_returning" ->
      """WITH d AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
                    FROM events),
         f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY 1)
         SELECT d.day,
                CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
                CAST(SUM(CASE WHEN d.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
         FROM d JOIN f USING (user_id)
         GROUP BY d.day ORDER BY d.day""",

    // mirror of evt_concurrency_peak: same sessionize, same
    // day-boundary clipping (one ±1 pair per day spanned), same
    // starts-before-ends tie order in the sweep window
    "evt_concurrency_peak" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         l AS (SELECT user_id, event_id, ts_ms,
                 lag(ts_ms, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_ts
               FROM e),
         f AS (SELECT user_id, event_id, ts_ms,
                 CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000 THEN 1 ELSE 0 END AS new_sess
               FROM l),
         sid AS (SELECT user_id, ts_ms,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                 FROM f),
         sess AS (SELECT user_id, session_id, MIN(ts_ms) AS s_ms, MAX(ts_ms) AS e_ms
                  FROM sid GROUP BY 1, 2),
         sd AS (SELECT user_id, s_ms, e_ms,
                  UNNEST(range(s_ms // 86400000, e_ms // 86400000 + 1)) AS day
                FROM sess),
         cl AS (SELECT user_id, day,
                  greatest(s_ms, day * 86400000) AS cs,
                  least(e_ms, (day + 1) * 86400000) AS ce
                FROM sd),
         b AS (SELECT user_id, day, cs AS t, 1 AS delta FROM cl
               UNION ALL
               SELECT user_id, day, ce AS t, -1 AS delta FROM cl),
         o AS (SELECT day, delta,
                 SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
               FROM b)
         SELECT day, CAST(MAX(open) AS BIGINT) AS peak_concurrent,
                CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
         FROM o GROUP BY day ORDER BY day""",

    // mirror of evt_asof_enrich: same interleaved window forward-fill
    // (IGNORE NULLS last_value over the same (ts, event_id) order)
    "evt_asof_enrich" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms, event_id,
                       event_type,
                       json_extract_string(props, '$$.k')::BIGINT AS k
                     FROM events
                     WHERE event_type IN ('click', 'purchase')),
          f AS (SELECT user_id, event_id, ts_ms, event_type,
                  last_value(CASE WHEN event_type = 'purchase' THEN k END
                             IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS k_asof
                FROM e)
          SELECT user_id, event_id, ts_ms, k_asof
          FROM f WHERE event_type = 'click'
          ORDER BY user_id, ts_ms, event_id""",

    // mirror of cdc_scd2: same change detection (lag over the full
    // log) and interval close (lead over the change rows)
    "cdc_scd2" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms, event_id,
                       json_extract_string(props, '$$.k')::BIGINT AS k
                     FROM events
                     WHERE json_extract_string(props, '$$.k') IS NOT NULL),
          c AS (SELECT *, lag(k) OVER (PARTITION BY user_id
                                       ORDER BY ts_ms, event_id) AS prev_k
                FROM e),
          ch AS (SELECT * FROM c WHERE prev_k IS NULL OR prev_k <> k),
          v AS (SELECT user_id, event_id, k, ts_ms AS valid_from,
                  lead(ts_ms) OVER (PARTITION BY user_id
                                    ORDER BY ts_ms, event_id) - 1 AS valid_to
                FROM ch)
          SELECT user_id, event_id, k, valid_from, valid_to,
                 CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
          FROM v ORDER BY user_id, valid_from, event_id""",

    // mirror of evt_vwap: same JSON weight extraction, same decimal
    // weighted sum; hour bucket via ms modulo (not date_trunc — the two
    // must share the integer arithmetic)
    "evt_vwap" ->
      s"""WITH e AS (SELECT event_type, epoch_ns(ts) // 1000000 AS ts_ms,
                       value, json_extract_string(props, '$$.k')::BIGINT AS w
                     FROM events),
          f AS (SELECT * FROM e WHERE w IS NOT NULL AND w > 0)
          SELECT event_type, ts_ms - (ts_ms % 3600000) AS hour_ms,
                 CAST(SUM(w) AS BIGINT) AS volume,
                 ${graft.core.D.oR4(
                   "CAST(SUM(CAST(value * w AS DECIMAL(18,4))) AS DOUBLE) / SUM(w)")}
                   AS vwap
          FROM f GROUP BY 1, 2 ORDER BY 1, 2""",

    "evt_rfm" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms, value
                     FROM events WHERE event_type = 'purchase'),
          u AS (SELECT user_id,
                  (${Tables.NowMs} - max(ts_ms)) // $DayMs AS recency_d,
                  count(*) AS frequency,
                  ${graft.core.D.oR4(graft.core.D.oSumDec("value"))} AS monetary
                FROM e GROUP BY 1),
          sc AS (SELECT user_id, recency_d, frequency, monetary,
                   ntile(4) OVER (ORDER BY recency_d, user_id) AS r_score,
                   ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
                   ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
                 FROM u)
          SELECT user_id, recency_d, frequency, monetary,
                 r_score, f_score, m_score,
                 CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                   || CAST(m_score AS VARCHAR) AS segment
          FROM sc ORDER BY user_id""",

    "evt_session_quartiles" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS ts_ms
                    FROM events),
         l AS (SELECT user_id, event_id, ts_ms,
                 lag(ts_ms) OVER (PARTITION BY user_id
                                  ORDER BY ts_ms, event_id) AS prev_ts
               FROM e),
         b AS (SELECT user_id, event_id, ts_ms,
                 CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000
                      THEN 1 ELSE 0 END AS new_sess
               FROM l),
         s AS (SELECT user_id, ts_ms,
                 SUM(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, event_id ROWS UNBOUNDED PRECEDING) AS session_id
               FROM b),
         d AS (SELECT user_id, session_id,
                 max(ts_ms) - min(ts_ms) AS dur_ms, count(*) AS n_events
               FROM s GROUP BY 1, 2)
         SELECT count(*) AS n_sessions,
                ROUND(quantile_cont(dur_ms, 0.25) * 10000.0, 0) / 10000.0 + 0.0 AS p25_ms,
                ROUND(quantile_cont(dur_ms, 0.5) * 10000.0, 0) / 10000.0 + 0.0 AS p50_ms,
                ROUND(quantile_cont(dur_ms, 0.75) * 10000.0, 0) / 10000.0 + 0.0 AS p75_ms,
                ROUND((CAST(SUM(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                  * 10000.0, 0) / 10000.0 + 0.0 AS mean_events
         FROM d""",

    "evt_ab_lift" -> {
      val r4 = (x: String) => graft.core.D.oR4(x)
      s"""WITH u AS (SELECT user_id,
                       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
                     FROM events GROUP BY 1),
          a AS (SELECT user_id, conv, user_id % 2 AS arm FROM u),
          c AS (SELECT
                  SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
                  SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS conv_a,
                  SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
                  SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS conv_b
                FROM a),
          r AS (SELECT n_a, conv_a, n_b, conv_b,
                  ${r4("CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)")} AS cvr_a,
                  ${r4("CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)")} AS cvr_b
                FROM c)
          SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
                 CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
                 cvr_a, cvr_b,
                 ${r4("cvr_b / cvr_a - 1.0")} AS lift
          FROM r"""
    },

    // mirror of evt_cuped_lift: midpoint split, exact-integer
    // sufficient stats for θ, r4 means — every SUM cast BIGINT
    "evt_cuped_lift" -> {
      val r4 = (x: String) => graft.core.D.oR4(x)
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms,
                       event_type FROM events),
          m AS (SELECT MIN(ts_ms) + (MAX(ts_ms) - MIN(ts_ms)) // 2 AS mid
                FROM e),
          u AS (SELECT user_id,
                  CAST(SUM(CASE WHEN ts_ms < mid THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
                  CAST(SUM(CASE WHEN ts_ms >= mid AND event_type = 'purchase'
                    THEN 1 ELSE 0 END) AS BIGINT) AS y
                FROM e CROSS JOIN m GROUP BY 1),
          ua AS (SELECT user_id % 2 AS arm, x, y FROM u),
          st AS (SELECT COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
                 FROM ua),
          th AS (SELECT
                   ${r4("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)")} AS theta,
                   ${r4("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)")} AS mx
                 FROM st),
          ar AS (SELECT arm, COUNT(*) AS n_u,
                   CAST(SUM(x) AS BIGINT) AS ax, CAST(SUM(y) AS BIGINT) AS ay
                 FROM ua GROUP BY 1)
          SELECT arm, n_u, theta,
            ${r4("CAST(ay AS DOUBLE) / CAST(n_u AS DOUBLE)")} AS mean_y,
            ${r4(s"${r4("CAST(ay AS DOUBLE) / CAST(n_u AS DOUBLE)")} - theta * (${r4("CAST(ax AS DOUBLE) / CAST(n_u AS DOUBLE)")} - mx)")} AS mean_y_adj
          FROM ar CROSS JOIN th ORDER BY arm"""
    },

    // mirror of evt_ab_srm: same distinct user-day frame, parity
    // arms, r4 chi-square against the same critical value
    "evt_ab_srm" -> {
      val ex = "CAST(n_a + n_b AS DOUBLE) / 2.0"
      s"""WITH e AS (SELECT DISTINCT user_id,
                       (epoch_ns(ts) // 1000000) // $DayMs AS day FROM events),
          p AS (SELECT day,
                  CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
                  CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
                FROM e GROUP BY 1),
          c AS (SELECT day, n_a, n_b,
                  ${graft.core.D.oR4(
                    s"(CAST(n_a AS DOUBLE) - $ex) * (CAST(n_a AS DOUBLE) - $ex) / ($ex) + " +
                    s"(CAST(n_b AS DOUBLE) - $ex) * (CAST(n_b AS DOUBLE) - $ex) / ($ex)")} AS chi2
                FROM p)
          SELECT day, n_a, n_b, chi2, chi2 > 3.8415 AS srm
          FROM c ORDER BY day"""
    },

    // mirror of evt_survival_km: same duration/censoring rules, same
    // desc-cumsum risk sets, same per-prefix left-fold product with
    // one r4 at the end (list_reduce ≡ the engine's aggregate fold;
    // the engine's 1.0 init is an IEEE no-op)
    "evt_survival_km" -> {
      val r4 = (x: String) => graft.core.D.oR4(x)
      s"""WITH e AS (SELECT user_id,
                       (epoch_ns(ts) // 1000000) // $DayMs AS day FROM events),
          u AS (SELECT user_id, MIN(day) AS fd, MAX(day) AS ld
                FROM e GROUP BY 1),
          mx AS (SELECT MAX(ld) AS cl FROM u),
          lf AS (SELECT (ld - fd) // 7 AS t,
                   CASE WHEN cl - ld >= 28 THEN 1 ELSE 0 END AS ch
                 FROM u CROSS JOIN mx),
          wk AS (SELECT t, CAST(SUM(ch) AS BIGINT) AS d, COUNT(*) AS obs
                 FROM lf GROUP BY 1),
          r AS (SELECT t, d, obs,
                  CAST(SUM(obs) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
                FROM wk),
          fx AS (SELECT t, d, obs, n_risk,
                   CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS fct
                 FROM r),
          a AS (SELECT list(fct ORDER BY t) AS fs, list(t ORDER BY t) AS ts
                FROM fx),
          ix AS (SELECT fs, ts, UNNEST(range(1, len(fs) + 1)) AS i FROM a),
          s AS (SELECT ts[i] AS week,
                  ${r4("list_reduce(list_slice(fs, 1, i), (x, y) -> x * y)")} AS survival
                FROM ix)
          SELECT fx.t AS week, fx.n_risk, fx.d AS n_churned,
                 fx.obs - fx.d AS n_censored, s.survival
          FROM fx JOIN s ON s.week = fx.t ORDER BY week"""
    },

    "evt_churn_weekly" ->
      s"""WITH weeks AS (SELECT DISTINCT user_id,
                                (epoch_ns(ts) // 1000000) // $WeekMs AS week
                         FROM events),
          act AS (SELECT week, count(*) AS n_active FROM weeks GROUP BY 1),
          ret AS (SELECT w.week, count(*) AS n_retained
                  FROM weeks w JOIN weeks n ON n.user_id = w.user_id
                    AND n.week = w.week + 1
                  GROUP BY 1),
          grid AS (SELECT DISTINCT week FROM weeks),
          g2 AS (SELECT week FROM grid WHERE week + 1 IN (SELECT week FROM grid))
          SELECT a.week, a.n_active,
                 COALESCE(r.n_retained, 0) AS n_retained,
                 a.n_active - COALESCE(r.n_retained, 0) AS n_churned,
                 ${graft.core.D.oR4(
                   "CAST(a.n_active - COALESCE(r.n_retained, 0) AS DOUBLE)" +
                   " / CAST(a.n_active AS DOUBLE)")} AS churn_rate
          FROM act a JOIN g2 ON g2.week = a.week
          LEFT JOIN ret r ON r.week = a.week
          ORDER BY a.week""",
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

    // mirror of evt_attribution: the struct max ≡ the
    // (t_ts DESC, channel DESC) rn=1 arg-max
    "evt_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         p AS (SELECT event_id AS purchase_id, user_id, ts_ms AS p_ts
               FROM e WHERE event_type = 'purchase'),
         t AS (SELECT user_id AS t_user, ts_ms AS t_ts, event_type AS channel
               FROM e WHERE event_type IN ('click', 'view')),
         j AS (SELECT p.purchase_id, p.user_id, p.p_ts, t.t_ts, t.channel
               FROM p LEFT JOIN t ON t.t_user = p.user_id
                 AND t.t_ts <= p.p_ts AND t.t_ts > p.p_ts - 604800000),
         a AS (SELECT purchase_id, user_id, p_ts, t_ts, channel,
                      row_number() OVER (PARTITION BY purchase_id
                        ORDER BY t_ts DESC NULLS LAST, channel DESC) AS rn
               FROM j)
         SELECT purchase_id, user_id, p_ts,
                COALESCE(channel, 'none') AS channel, t_ts AS touch_ts
         FROM a WHERE rn = 1 ORDER BY purchase_id""",

    // mirror of evt_attribution_first: the struct min ≡ the
    // (t_ts ASC, channel ASC) NULLS LAST rn=1 arg-min
    "evt_attribution_first" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         p AS (SELECT event_id AS purchase_id, user_id, ts_ms AS p_ts
               FROM e WHERE event_type = 'purchase'),
         t AS (SELECT user_id AS t_user, ts_ms AS t_ts, event_type AS channel
               FROM e WHERE event_type IN ('click', 'view')),
         j AS (SELECT p.purchase_id, p.user_id, p.p_ts, t.t_ts, t.channel
               FROM p LEFT JOIN t ON t.t_user = p.user_id
                 AND t.t_ts <= p.p_ts AND t.t_ts > p.p_ts - 604800000),
         a AS (SELECT purchase_id, user_id, p_ts, t_ts, channel,
                      row_number() OVER (PARTITION BY purchase_id
                        ORDER BY t_ts ASC NULLS LAST, channel ASC NULLS LAST) AS rn
               FROM j)
         SELECT purchase_id, user_id, p_ts,
                COALESCE(channel, 'none') AS channel, t_ts AS touch_ts
         FROM a WHERE rn = 1 ORDER BY purchase_id""",

    "evt_wau_rolling" ->
      """WITH days AS (SELECT DISTINCT user_id,
                              (epoch_ns(ts) // 1000000) // 86400000 AS day
                       FROM events),
         grid AS (SELECT DISTINCT day AS d FROM days)
         SELECT g.d AS day, count(DISTINCT dy.user_id) AS wau
         FROM grid g JOIN days dy ON dy.day BETWEEN g.d - 6 AND g.d
         GROUP BY 1 ORDER BY 1""",

    // mirror of evt_type_entropy: same per-user probability window and
    // dec10 entropy-term sum as the char-entropy mirror
    "evt_type_entropy" ->
      s"""WITH c AS (SELECT user_id, event_type,
                       CAST(count(*) AS DOUBLE) AS cnt
                     FROM events GROUP BY 1, 2),
          pp AS (SELECT user_id, cnt,
                   cnt / sum(cnt) OVER (PARTITION BY user_id) AS p
                 FROM c)
          SELECT user_id, count(*) AS n_types,
                 CAST(SUM(cnt) AS BIGINT) AS n_events,
                 ${graft.core.D.oR4(graft.core.D.oSumDec10("-p * log2(p)"))}
                   AS entropy
          FROM pp GROUP BY user_id ORDER BY user_id""",

    // mirror of evt_gini_activity: same ascending (cnt, user_id) rank,
    // same double-cast products in the final expression
    "evt_gini_activity" ->
      s"""WITH per AS (SELECT event_type, user_id, count(*) AS cnt
                       FROM events GROUP BY 1, 2),
          rk AS (SELECT event_type, cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cnt, user_id) AS i
                 FROM per),
          ag AS (SELECT event_type,
                   count(*) AS n_users,
                   CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(SUM(i * cnt) AS BIGINT) AS iwsum
                 FROM rk GROUP BY 1)
          SELECT event_type, n_users, total,
                 ${graft.core.D.oR4(
                   "2.0 * iwsum / (CAST(n_users AS DOUBLE) * CAST(total AS DOUBLE))" +
                   " - CAST(n_users + 1 AS DOUBLE) / CAST(n_users AS DOUBLE)")}
                   AS gini
          FROM ag ORDER BY event_type""",

    // mirror of evt_zipf_fit: same per-term decimal-quantized logs,
    // same OLS derivation (slope expanded textually inside intercept)
    "evt_zipf_fit" -> {
      val slope = "((m * sxy - sx * sy) / (m * sxx - sx * sx))"
      s"""WITH u AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
          r AS (SELECT
                  CAST(ln(CAST(row_number() OVER (ORDER BY n DESC, user_id)
                    AS DOUBLE)) AS DECIMAL(18,4)) AS lx,
                  CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(18,4)) AS ly
                FROM u),
          st AS (SELECT CAST(count(*) AS DOUBLE) AS m,
                   CAST(SUM(lx) AS DOUBLE) AS sx,
                   CAST(SUM(ly) AS DOUBLE) AS sy,
                   CAST(SUM(lx * lx) AS DOUBLE) AS sxx,
                   CAST(SUM(lx * ly) AS DOUBLE) AS sxy
                 FROM r)
          SELECT CAST(m AS BIGINT) AS n_users,
                 ${graft.core.D.oR4(slope)} AS slope,
                 ${graft.core.D.oR4(s"(sy - $slope * sx) / m")} AS intercept
          FROM st"""
    },

    "evt_markov_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         l AS (SELECT event_type AS next_type,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts_ms, event_id) AS prev_type
               FROM e)
         SELECT prev_type, next_type, count(*) AS n
         FROM l WHERE prev_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "evt_conversion_time" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         v AS (SELECT user_id, min(ts_ms) AS t_view FROM e
               WHERE event_type = 'view' GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts_ms) AS t_purchase, min(v.t_view) AS t_view
               FROM e JOIN v ON e.user_id = v.user_id AND e.ts_ms >= v.t_view
               WHERE e.event_type = 'purchase' GROUP BY 1),
         d AS (SELECT t_purchase - t_view AS delta_ms FROM p)
         SELECT count(*) AS n_converted,
                ROUND(quantile_cont(delta_ms, 0.25) * 10000.0, 0) / 10000.0 + 0.0 AS p25_ms,
                ROUND(quantile_cont(delta_ms, 0.5) * 10000.0, 0) / 10000.0 + 0.0 AS p50_ms,
                ROUND(quantile_cont(delta_ms, 0.9) * 10000.0, 0) / 10000.0 + 0.0 AS p90_ms
         FROM d""",

    // mirror of join_asof_forward: the struct min ≡ the
    // (p_ts ASC, p_id ASC) NULLS LAST rn=1 arg-min
    "join_asof_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         sgn AS (SELECT event_id AS signup_id, user_id, ts_ms AS s_ts
                 FROM e WHERE event_type = 'signup'),
         pur AS (SELECT user_id AS p_user, ts_ms AS p_ts, event_id AS p_id
                 FROM e WHERE event_type = 'purchase'),
         j AS (SELECT s.signup_id, s.user_id, s.s_ts, p.p_ts, p.p_id
               FROM sgn s LEFT JOIN pur p ON p.p_user = s.user_id
                 AND p.p_ts >= s.s_ts),
         a AS (SELECT signup_id, user_id, s_ts, p_ts, p_id,
                      row_number() OVER (PARTITION BY signup_id
                        ORDER BY p_ts ASC NULLS LAST, p_id ASC NULLS LAST) AS rn
               FROM j)
         SELECT signup_id, user_id, s_ts,
                p_ts AS next_purchase_ts, p_id AS next_purchase_id
         FROM a WHERE rn = 1 ORDER BY signup_id""",

    "evt_funnel_window" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         v AS (SELECT user_id, min(ts_ms) AS t_view FROM e
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(e.ts_ms) AS t_click FROM e
               JOIN v ON e.user_id = v.user_id AND e.ts_ms >= v.t_view
                 AND e.ts_ms <= v.t_view + 604800000
               WHERE e.event_type = 'click' GROUP BY 1),
         p AS (SELECT e.user_id, min(e.ts_ms) AS t_purchase FROM e
               JOIN c ON e.user_id = c.user_id AND e.ts_ms >= c.t_click
                 AND e.ts_ms <= c.t_click + 604800000
               WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT stage, n_users FROM (
           SELECT '1_view' AS stage, count(*) AS n_users FROM v
           UNION ALL SELECT '2_click', count(*) FROM c
           UNION ALL SELECT '3_purchase', count(*) FROM p)
         ORDER BY stage""",

    "evt_stickiness" ->
      """WITH days AS (SELECT DISTINCT user_id,
                              (epoch_ns(ts) // 1000000) // 86400000 AS day
                       FROM events),
         dau AS (SELECT day, count(*) AS dau FROM days GROUP BY 1),
         grid AS (SELECT DISTINCT day AS d FROM days),
         mau AS (SELECT g.d, count(DISTINCT dy.user_id) AS mau
                 FROM grid g JOIN days dy ON dy.day BETWEEN g.d - 29 AND g.d
                 GROUP BY 1)
         SELECT a.day, a.dau, m.mau,
                ROUND((CAST(a.dau AS DOUBLE) / CAST(m.mau AS DOUBLE)) * 10000.0, 0)
                  / 10000.0 + 0.0 AS stickiness
         FROM dau a JOIN mau m ON a.day = m.d
         ORDER BY a.day""",

    "evt_path_topk" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
                           epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         l AS (SELECT event_type,
                      lead(event_type, 1) OVER (PARTITION BY user_id
                        ORDER BY ts_ms, event_id) AS e2,
                      lead(event_type, 2) OVER (PARTITION BY user_id
                        ORDER BY ts_ms, event_id) AS e3
               FROM e)
         SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
         FROM l WHERE e2 IS NOT NULL AND e3 IS NOT NULL
         GROUP BY 1 ORDER BY n DESC, path LIMIT 10""",

    "evt_cohort_ltv" ->
      s"""WITH e AS (SELECT user_id, event_type, value,
                            (epoch_ns(ts) // 1000000) // $WeekMs AS week
                     FROM events),
          cohort AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
          sizes AS (SELECT cohort_week, count(*) AS n_users FROM cohort GROUP BY 1),
          rev AS (SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
                    ${graft.core.D.oR4(graft.core.D.oSumDec("e.value"))} AS rev
                  FROM e JOIN cohort c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
          cum AS (SELECT cohort_week, week_offset, rev,
                    CAST(SUM(CAST(rev AS DECIMAL(18,4))) OVER
                      (PARTITION BY cohort_week ORDER BY week_offset
                       ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
                  FROM rev)
          SELECT c.cohort_week, c.week_offset, c.rev, c.cum_rev,
                 ${graft.core.D.oR4("c.cum_rev / CAST(s.n_users AS DOUBLE)")}
                   AS ltv_per_user
          FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
          ORDER BY 1, 2""",

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
