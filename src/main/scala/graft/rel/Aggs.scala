package graft.rel

import graft.core.{D, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** §2.D aggregation surface. All double aggregation goes through
  * DECIMAL(18,4) (D3) so partial/final aggregation order — which differs
  * between a 32-thread local run and a 1000-executor cluster — can never
  * change the result. Spark's hash aggregate does map-side partial
  * aggregation automatically; grouping cardinalities here are tiny
  * relative to input, so each shuffle moves (groups × partitions) rows.
  */
object Aggs {
  type Q = (SparkSession, String) => DataFrame

  /** Weighted average as a typed Aggregator (UDAF surface, `agg_custom_typed`).
    * Buffer keeps exact BigDecimal sums (scale-4 per-element rounding =
    * the same contract as D3 decimal casts), so merge order is irrelevant. */
  class WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    private def dec4(d: Double): BigDecimal =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + dec4(a._1 * a._2), b._2 + dec4(a._2))
    def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (BigDecimal, BigDecimal)): Double =
      // same scaled-integer rounding as D.r4s / D.oR4 (cross-engine safe)
      BigDecimal((b._1.toDouble / b._2.toDouble) * 10000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 10000.0
    def bufferEncoder = org.apache.spark.sql.Encoders.product[(BigDecimal, BigDecimal)]
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  val queries: Map[String, Q] = graft.core.Reg.uniqueMap(
    // Exact weighted median (lower): per group, the smallest value v
    // whose cumulative weight reaches half the group's total —
    // inventory valuation / weighted-latency SLO shape. The cumulative
    // sum uses a RANGE frame (whole tie group included), so the result
    // is permutation-proof without a tie-break column; weights are
    // integer-valued doubles, so every sum is exact. Cost: one
    // group-partitioned sort window + the final group aggregate —
    // at 100 TB a hash-partition-by-group sort-within-partitions pass,
    // no self-join against the per-group total (that's the second
    // window below, same partitioning, zero extra shuffles).
    "agg_weighted_median" -> ((s, dir) => {
      val wc = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("l_returnflag")
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
        .withColumn("cw", sum(col("l_quantity")).over(wc))
        .withColumn("tw", sum(col("l_quantity")).over(wt))
        .where(col("cw") * 2 >= col("tw"))
        .groupBy("l_returnflag")
        .agg(min(col("l_extendedprice")).as("w_median"),
          min(col("tw")).cast("long").as("total_weight"))
        .orderBy("l_returnflag")
    }),

    // Geometric and harmonic means (rate/ratio averaging — the means
    // plain avg gets wrong for multiplicative growth and rates): both
    // from exact DECIMAL(28,10) sums of the per-row transforms (ln x
    // and 1/x — the reciprocals are O(1e-5), which DECIMAL(18,4)
    // would crush), so partial/final combine order can't move the
    // result; one partial→final aggregate, 3 groups out.
    "agg_geo_harmonic" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          D.r4s(exp(sum(D.dec10(log(col("l_extendedprice")))).cast("double") /
            count(lit(1)))).as("geo_mean"),
          D.r4s(count(lit(1)).cast("double") /
            sum(D.dec10(lit(1.0) / col("l_extendedprice"))).cast("double"))
            .as("harm_mean"))
        .orderBy("l_returnflag")),

    // revenue concentration (the 80/20 curve): customers ranked by
    // exact-decimal revenue into deciles, each decile's share and the
    // cumulative share. Windows run over the REDUCED customer frame
    // (orders collapses first), decile sums are exact decimals, and
    // only the two final shares divide — the whole query moves
    // customer-count rows once and 10 rows after that. The ntile
    // tie-break (revenue desc, custkey) keeps decile edges
    // engine-portable.
    // MULTIPLE distinct aggregates in one query — Catalyst plans the
    // n-distinct case with an Expand (one replicated stream per
    // distinct set, gid-tagged) into a single aggregate tree instead
    // of n self-joins; mixing in a plain sum exercises the
    // non-distinct lane of the same Expand.
    "agg_multi_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(expr("ts_ms DIV 86400000")).as("n_days"),
          count(lit(1)).as("n_events"),
          D.r4s(sum(D.dec(col("value"))).cast("double")).as("sum_value"))
        .orderBy("event_type")),

    // GROUPING() disambiguation on a rollup: a NULL group key from the
    // data vs a NULL minted by the rollup are different things, and
    // grouping() is the only honest way to tell them apart (the BI-tool
    // subtotal-labeling contract). gid = the 2-bit mask derived from
    // the two flags — identical integers on both engines.
    "agg_grouping_id" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"))
        .withColumn("gid", col("g_flag") * 2 + col("g_status"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // higher distribution moments (skewness + excess kurtosis) per
    // group from the four exact-decimal raw power sums — native
    // skewness()/kurtosis() are float-order dependent, the sufficient-
    // statistic formulation is not. l_quantity's integer values keep
    // every power exact in double before the decimal quantization; all
    // central-moment derivation runs in DOUBLE at the end with a fixed
    // association mirrored by the oracle. ONE partial→final aggregate,
    // groups-sized shuffle.
    "agg_moments" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val x = col("l_quantity")
      val st = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast("double").as("n"),
        sum(D.dec(x)).cast("double").as("s1"),
        sum(D.dec(x * x)).cast("double").as("s2"),
        sum(D.dec(x * x * x)).cast("double").as("s3"),
        sum(D.dec(x * x * x * x)).cast("double").as("s4"))
      val n = col("n")
      val mu = col("s1") / n
      val m2 = col("s2") / n - mu * mu
      val m3 = col("s3") / n - lit(3.0) * mu * (col("s2") / n) +
        lit(2.0) * mu * mu * mu
      val m4 = col("s4") / n - lit(4.0) * mu * (col("s3") / n) +
        lit(6.0) * mu * mu * (col("s2") / n) - lit(3.0) * mu * mu * mu * mu
      st.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
          D.r4s(mu).as("mean"), D.r4s(m2).as("m2"),
          D.r4s(m3 / sqrt(m2 * m2 * m2)).as("skewness"),
          D.r4s(m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
        .orderBy("l_returnflag")
    }),

    // pairwise Pearson correlation matrix over lineitem's numeric
    // measures in ONE pass: all nine sufficient statistics (n, three
    // sums, three squares, three cross-products) come from a single
    // partial→final aggregate over the scan — the shuffle moves ONE
    // row — and the three r values are derived from that row
    // driver-free as a 3-row union. Same exact-decimal formulation as
    // tsdb_series_corr ((18,4)² products stay inside DECIMAL(38) on
    // both engines); adding a measure column grows the stat row, not
    // the pass count.
    "agg_corr_matrix" -> ((s, dir) => {
      val d18 = org.apache.spark.sql.types.DecimalType(18, 4)
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val p2 = (a: String, b: String) =>
        sum(col(a).cast(d18) * col(b).cast(d18)).cast("double")
      val st = li.agg(
        count(lit(1)).cast("double").as("n"),
        sum(D.dec(col("l_quantity"))).cast("double").as("sq"),
        sum(D.dec(col("l_extendedprice"))).cast("double").as("sp"),
        sum(D.dec(col("l_discount"))).cast("double").as("sd"),
        p2("l_quantity", "l_quantity").as("sqq"),
        p2("l_extendedprice", "l_extendedprice").as("spp"),
        p2("l_discount", "l_discount").as("sdd"),
        p2("l_quantity", "l_extendedprice").as("sqp"),
        p2("l_quantity", "l_discount").as("sqd"),
        p2("l_extendedprice", "l_discount").as("spd"))
      def r(sx: String, sy: String, sxy: String, sxx: String, syy: String) =
        D.r4s((col("n") * col(sxy) - col(sx) * col(sy)) /
          sqrt((col("n") * col(sxx) - col(sx) * col(sx)) *
               (col("n") * col(syy) - col(sy) * col(sy))))
      val row = (a: String, b: String, rc: org.apache.spark.sql.Column) =>
        st.select(lit(a).as("col_a"), lit(b).as("col_b"), rc.as("r"))
      row("l_quantity", "l_extendedprice", r("sq", "sp", "sqp", "sqq", "spp"))
        .unionAll(row("l_quantity", "l_discount", r("sq", "sd", "sqd", "sqq", "sdd")))
        .unionAll(row("l_extendedprice", "l_discount", r("sp", "sd", "spd", "spp", "sdd")))
        .orderBy("col_a", "col_b")
    }),

    "agg_revenue_pareto" -> ((s, dir) => {
      val rev = Tables.orders(s, dir).groupBy("o_custkey")
        .agg(sum(D.dec(col("o_totalprice"))).as("rev"))
      val dec = rev.withColumn("decile",
        ntile(10).over(Window.orderBy(col("rev").desc, col("o_custkey"))))
      val per = dec.groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("drev"))
      val tot = per.agg(sum(col("drev")).as("trev"))
      val cum = sum(col("drev")).over(
        Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0))
      per.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_customers"),
          D.r4s(col("drev").cast("double")).as("revenue"),
          D.r4s(col("drev").cast("double") / col("trev").cast("double"))
            .as("share"),
          D.r4s(cum.cast("double") / col("trev").cast("double"))
            .as("cum_share"))
        .orderBy("decile")
    }),

    // EXACT distinct users per metric via mergeable bitmaps: ids are
    // bucketed (bitmap_bucket_number), per-(metric, half, bucket)
    // bitmaps built with bitmap_construct_agg, cross-source merge is
    // bitmap_or_agg, and the final count is Σ bitmap_count over the id
    // buckets. This is the sketch-mergeability property agg_hll_merge
    // buys approximately, bought EXACTLY: at 100 TB the shuffle moves
    // (groups × id-buckets) fixed-size bitmaps instead of raw ids, and
    // pre-built per-partition/per-day bitmaps re-aggregate for free.
    // The deliberate two-source split (event_id parity) exercises the
    // or-merge the way a per-day rollup table would.
    "agg_bitmap_distinct" -> ((s, dir) => {
      val halves = Tables.events(s, dir)
        .select(col("event_type"), pmod(col("event_id"), lit(2)).as("half"),
          expr("bitmap_bucket_number(user_id)").as("bkt"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy("event_type", "half", "bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      halves.groupBy("event_type", "bkt")
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .groupBy("event_type")
        .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
        .orderBy("event_type")
    }),

    // Audience-overlap via partitioned bitmaps (r11): |click ∩
    // purchase| users WITHOUT a distinct-distinct join. Each segment
    // reduces map-side to one bitmap per 2¹⁵-id bucket
    // (bitmap_construct_agg); per-segment cardinalities and the OR'd
    // union come off those segment×bucket bitmaps, and the
    // intersection is inclusion–exclusion |A|+|B|−|A∪B| — EXACT for
    // bitmaps (unlike HLL, whose registers can't intersect). At
    // 100 TB the only shuffle payload is one bitmap per
    // (segment, id-bucket): the roaring-bitmap audience-analysis
    // shape every ad/product-analytics stack runs.
    "agg_bitmap_intersect" -> ((s, dir) => {
      val seg = graft.core.Exec.materialize(Tables.events(s, dir)
        .where(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("seg"),
          expr("bitmap_bucket_number(user_id)").as("bkt"),
          expr("bitmap_bit_position(user_id)").as("pos"))
        .groupBy("seg", "bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm")))
      val nClick = seg.where(col("seg") === "click")
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_click"))
      val nPur = seg.where(col("seg") === "purchase")
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_purchase"))
      val nUnion = seg.groupBy("bkt")
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_union"))
      nClick.crossJoin(nPur).crossJoin(nUnion)
        .select(col("n_click"), col("n_purchase"), col("n_union"),
          (col("n_click") + col("n_purchase") - col("n_union")).as("n_both"),
          D.r4s((col("n_click") + col("n_purchase") - col("n_union"))
            .cast("double") / col("n_union")).as("jaccard"))
    }),

    // TPC-H Q1 shape
    "agg_hash_groupby" -> ((s, dir) => {
      val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          D.sumDec(col("l_quantity")).as("sum_qty"),
          D.sumDec(col("l_extendedprice")).as("sum_base_price"),
          D.sumDec(disc).as("sum_disc_price"),
          D.avgDec(col("l_quantity")).as("avg_qty"),
          D.avgDec(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_global" -> ((s, dir) =>
      Tables.lineitem(s, dir).agg(
        D.sumDec(col("l_extendedprice")).as("sum_price"),
        D.avgDec(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("n"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))),

    "agg_count_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // HLL register MERGE across groups: the property that makes sketches
    // the 100 TB distinct-count answer — per-group sketches combine by
    // register max into the UNION's sketch, no re-scan. Built from the
    // same md5 register derivation as agg_approx_distinct_hll: per-type
    // registers → bucket-wise max → one global estimate, compared to the
    // exact global distinct.
    "agg_hll_merge" -> ((s, dir) => {
      def nib(k: Int) = s"(instr('0123456789abcdef', substr(hx, $k, 1)) - 1)"
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val regsIn = ev
        .withColumn("hx", md5(col("user_id").cast("string").cast("binary")))
        .withColumn("bucket", expr(s"${nib(1)} * 16 + ${nib(2)}"))
        .withColumn("t", expr("trim(LEADING '0' FROM substr(hx, 3, 12))"))
        .withColumn("rho", expr(
          """CASE WHEN t = '' THEN 49
             ELSE (12 - length(t)) * 4 +
                  CASE WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 8 THEN 0
                       WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 4 THEN 1
                       WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 2 THEN 2
                       ELSE 3 END + 1 END"""))
      val perGroup = regsIn.groupBy("event_type", "bucket").agg(max(col("rho")).as("m"))
      val merged = perGroup.groupBy("bucket").agg(max(col("m")).as("m"))
      val est = merged
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 49 - m)")).as("s_present"),
          count(lit(1)).as("nb"))
        .withColumn("v", lit(256) - col("nb"))
        .withColumn("s_all", col("s_present") + col("v") * lit(562949953421312L))
        .withColumn("e_raw", expr(
          "(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 562949953421312.0 / CAST(s_all AS DOUBLE)"))
        .withColumn("approx_users", graft.core.D.r4s(expr(
          "CASE WHEN e_raw <= 640.0 AND v > 0 THEN 256.0 * ln(256.0 / v) ELSE e_raw END")))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
      est.crossJoin(exact).select("approx_users", "exact_users")
    }),

    // Explicit distributed HyperLogLog (m=256 registers, md5-derived
    // hash): per-value (bucket, rho) → per-group register MAX → harmonic
    // estimate with linear-counting correction. Two map-side-combinable
    // hash aggregates — exactly how sketch merge distributes on a
    // cluster — and, unlike approx_count_distinct's engine-internal
    // HLL++, every step is replicated by the DuckDB oracle. The register
    // sum Σ2^(-M) is carried as Σ2^(49-M) in BIGINT (exact, order-free).
    "agg_approx_distinct_hll" -> ((s, dir) => {
      def nib(k: Int) = s"(instr('0123456789abcdef', substr(hx, $k, 1)) - 1)"
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val regsIn = ev
        .withColumn("hx", md5(col("user_id").cast("string").cast("binary")))
        .withColumn("bucket", expr(s"${nib(1)} * 16 + ${nib(2)}"))
        .withColumn("t", expr("trim(LEADING '0' FROM substr(hx, 3, 12))"))
        .withColumn("rho", expr(
          """CASE WHEN t = '' THEN 49
             ELSE (12 - length(t)) * 4 +
                  CASE WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 8 THEN 0
                       WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 4 THEN 1
                       WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 2 THEN 2
                       ELSE 3 END + 1 END"""))
      val regs = regsIn.groupBy("event_type", "bucket").agg(max(col("rho")).as("m"))
      val est = regs.groupBy("event_type")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 49 - m)")).as("s_present"),
          count(lit(1)).as("nb"))
        .withColumn("v", lit(256) - col("nb"))
        .withColumn("s_all", col("s_present") + col("v") * lit(562949953421312L))
        .withColumn("e_raw", expr(
          "(0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 562949953421312.0 / CAST(s_all AS DOUBLE)"))
        .withColumn("approx_users", graft.core.D.r4s(expr(
          "CASE WHEN e_raw <= 640.0 AND v > 0 THEN 256.0 * ln(256.0 / v) ELSE e_raw END")))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, "event_type")
        .select("event_type", "approx_users", "exact_users")
        .orderBy("event_type")
    }),

    "agg_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("li_gs")
      s.sql(s"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_rf, CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               count(1) AS n
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),

    "agg_rollup" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("cust_ru")
      Tables.nation(s, dir).createOrReplaceTempView("nation_ru")
      Tables.region(s, dir).createOrReplaceTempView("region_ru")
      s.sql("""
        SELECT r_name, n_name, count(1) AS customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS acctbal
        FROM cust_ru
        JOIN nation_ru ON c_nationkey = n_nationkey
        JOIN region_ru ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    }),

    "agg_cube" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("day_ms", graft.tsdb.Downsample.bucketMs(col("ts_ms"), 86400000L))
        .cube("event_type", "day_ms")
        .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day_ms"))),

    "agg_first_last" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          min_by(col("value"), struct(col("ts_ms"), col("event_id"))).as("first_value"),
          max_by(col("value"), struct(col("ts_ms"), col("event_id"))).as("last_value"),
          count(lit(1)).as("n"))
        .orderBy("user_id")),

    "agg_percentile_exact" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(expr("percentile(value, array(0.5D, 0.95D, 0.99D))").as("pct"))
        .select(col("event_type"),
          D.r4s(element_at(col("pct"), 1)).as("p50"),
          D.r4s(element_at(col("pct"), 2)).as("p95"),
          D.r4s(element_at(col("pct"), 3)).as("p99"))
        .orderBy("event_type")),

    "agg_stddev_var" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(D.stddevSampDec(col("l_extendedprice")).as("sd"),
          D.varSampDec(col("l_extendedprice")).as("vr"))
        .orderBy("l_returnflag")),

    "agg_collect_sorted" -> ((s, dir) =>
      // '|'-joined: the driver compare can't sort array-valued cells
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(expr("array_join(transform(sort_array(collect_list(ts_ms)), x -> cast(x as string)), '|')").as("ts_list"),
          count(lit(1)).as("n"))
        .orderBy("user_id")),

    "agg_sum_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(sum_distinct(D.dec(col("l_quantity"))).cast("double").as("sum_dq"))
        .orderBy("l_returnflag")),

    "agg_custom_typed" -> ((s, dir) => {
      val wavg = udaf(new WeightedAvg)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // pivot: event counts per user fanned into one column per event type
    "agg_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)   // absent pivot cells surface as NULL after the pivot
        .orderBy("user_id")),

    // listagg / string_agg: ordered per-group concatenation
    "agg_listagg" -> ((s, dir) =>
      Tables.nation(s, dir)
        .groupBy("n_regionkey")
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
        .orderBy("n_regionkey")),

    // unpivot (stack): wide per-user event counts back to long form
    "fn_unpivot" -> ((s, dir) => {
      val wide = Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view"))
        .agg(count(lit(1))).na.fill(0L)
      wide.select(col("user_id"),
        expr("stack(2, 'click', click, 'view', view) AS (etype, n)"))
        .select("user_id", "etype", "n")
        .orderBy("user_id", "etype")
    }),

    // mode (most frequent value), deterministic: max count, then min value
    "agg_mode" -> ((s, dir) => {
      val counts = Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("c"))
      counts.groupBy("l_returnflag")
        .agg(max(struct(col("c"), (-col("l_quantity")).as("negq"))).as("m"))
        .select(col("l_returnflag"), (-col("m.negq")).as("mode_qty"),
          col("m.c").as("n"))
        .orderBy("l_returnflag")
    }),

    // correlated scalar subquery (Catalyst decorrelates it to a join):
    // orders costlier than their customer's average order
    "sub_correlated_scalar" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("ord_sub")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM ord_sub o
        WHERE o_totalprice > (SELECT ROUND((CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                            / COUNT(1)) * 10000.0, 0) / 10000.0 + 0.0
                              FROM ord_sub i WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    }),

    // filtered aggregates (SQL FILTER clause): per-group conditional
    // metrics in ONE aggregate pass — the dashboard staple that
    // otherwise becomes n self-joins; each FILTER is a per-row
    // predicate inside the same partial/final hash aggregate
    "agg_filtered" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("li_f")
      s.sql("""
        SELECT l_returnflag,
          COUNT(*) AS n_all,
          COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS qty_taxed,
          COUNT(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00') AS n_recent
        FROM li_f GROUP BY 1 ORDER BY 1""")
    }),

    // EXISTS / NOT EXISTS correlated subqueries (Catalyst rewrites to
    // semi/anti joins on the correlation key — one shuffle per subquery,
    // customer-count-sized): customers with at least one urgent order
    // but no filled ('F') order
    "sub_exists" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("cust_sub")
      Tables.orders(s, dir).createOrReplaceTempView("ord_sub")
      s.sql("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM cust_sub c
        WHERE EXISTS (SELECT 1 FROM ord_sub o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM ord_sub o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
        ORDER BY c_custkey""")
    }),

    // IN / NOT IN subqueries: IN plans as a left-semi join; NOT IN is
    // the null-aware anti join (both subquery columns are non-nullable
    // here, so Catalyst's null-aware machinery reduces to a plain anti
    // join — no per-row whole-table null probe at scale)
    "sub_in" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("cust_sub")
      Tables.orders(s, dir).createOrReplaceTempView("ord_sub")
      Tables.lineitem(s, dir).createOrReplaceTempView("li_sub")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM ord_sub
        WHERE o_custkey IN (SELECT c_custkey FROM cust_sub
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM li_sub
                                 WHERE l_discount > 0.08)
        ORDER BY o_orderkey""")
    })
  )

  val oracleSql: Map[String, String] = graft.core.Reg.uniqueMap(
    // the bitmap pipeline must land on the plain exact distinct
    "agg_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1 ORDER BY 1""",

    // mirror of agg_bitmap_intersect: exact distinct sets — the bitmap
    // inclusion-exclusion must equal the literal set intersection
    "agg_bitmap_intersect" ->
      s"""WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
          b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
          u AS (SELECT count(*) AS n_union FROM
                  (SELECT user_id FROM a UNION SELECT user_id FROM b)),
          m AS (SELECT (SELECT count(*) FROM a) AS n_click,
                       (SELECT count(*) FROM b) AS n_purchase,
                       (SELECT n_union FROM u) AS n_union)
          SELECT n_click, n_purchase, n_union,
                 n_click + n_purchase - n_union AS n_both,
                 ${graft.core.D.oR4(
                   "CAST(n_click + n_purchase - n_union AS DOUBLE) / n_union")} AS jaccard
          FROM m""",

    // mirror of agg_geo_harmonic: exp/reciprocal over the same
    // DECIMAL(28,10) sums
    "agg_geo_harmonic" ->
      """SELECT l_returnflag, count(*) AS n,
           ROUND(exp(CAST(SUM(CAST(ln(l_extendedprice) AS DECIMAL(28,10))) AS DOUBLE)
             / count(*)) * 10000.0, 0) / 10000.0 + 0.0 AS geo_mean,
           ROUND((count(*) / CAST(SUM(CAST(1.0 / l_extendedprice AS DECIMAL(28,10))) AS DOUBLE))
             * 10000.0, 0) / 10000.0 + 0.0 AS harm_mean
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // mirror of agg_weighted_median: the same RANGE-frame cumulative
    // weight (tie-group inclusive), min qualifying value per group
    "agg_weighted_median" ->
      """WITH c AS (SELECT l_returnflag, l_extendedprice, l_quantity,
              SUM(l_quantity) OVER (PARTITION BY l_returnflag
                ORDER BY l_extendedprice
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
              SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
            FROM lineitem)
         SELECT l_returnflag, MIN(l_extendedprice) AS w_median,
                CAST(MIN(tw) AS BIGINT) AS total_weight
         FROM c WHERE cw * 2 >= tw
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_multi_distinct" ->
      s"""SELECT event_type,
             count(DISTINCT user_id) AS n_users,
             count(DISTINCT (epoch_ns(ts) // 1000000) // 86400000) AS n_days,
             count(*) AS n_events,
             ${D.oR4(D.oSumDec("value"))} AS sum_value
          FROM events GROUP BY 1 ORDER BY 1""",

    "agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
            CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
            CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
            count(*) AS n,
            CAST(GROUPING(l_returnflag) AS BIGINT) * 2
              + CAST(GROUPING(l_linestatus) AS BIGINT) AS gid
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag ASC NULLS FIRST,
                  l_linestatus ASC NULLS FIRST""",

    // mirror of agg_moments: same raw power sums, same double-end
    // central-moment association (mu expanded textually everywhere the
    // engine's expression tree duplicates it)
    "agg_moments" -> {
      val mu = "(s1 / n)"
      val m2 = s"(s2 / n - $mu * $mu)"
      val m3 = s"(s3 / n - 3.0 * $mu * (s2 / n) + 2.0 * $mu * $mu * $mu)"
      val m4 = s"(s4 / n - 4.0 * $mu * (s3 / n) + " +
        s"6.0 * $mu * $mu * (s2 / n) - 3.0 * $mu * $mu * $mu * $mu)"
      s"""WITH st AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
            ${D.oSumDec("l_quantity")} AS s1,
            ${D.oSumDec("l_quantity * l_quantity")} AS s2,
            ${D.oSumDec("l_quantity * l_quantity * l_quantity")} AS s3,
            ${D.oSumDec("l_quantity * l_quantity * l_quantity * l_quantity")} AS s4
          FROM lineitem GROUP BY 1)
          SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                 ${D.oR4(mu)} AS mean, ${D.oR4(m2)} AS m2,
                 ${D.oR4(s"$m3 / sqrt($m2 * $m2 * $m2)")} AS skewness,
                 ${D.oR4(s"$m4 / ($m2 * $m2) - 3.0")} AS kurtosis
          FROM st ORDER BY 1"""
    },

    // mirror of agg_corr_matrix: identical nine-stat single aggregate,
    // identical double-derivation of each r. The oracle's product
    // casts are (19,4) — above 18 digits DuckDB switches to HUGEINT
    // storage, which the price² magnitudes need; both engines' sums
    // stay exact integers at 4+4 decimals, so the values are identical
    // to the Spark side's (18,4)² formulation.
    "agg_corr_matrix" -> {
      val q2 = (a: String, b: String) =>
        s"CAST(SUM(CAST($a AS DECIMAL(19,4)) * CAST($b AS DECIMAL(19,4))) AS DOUBLE)"
      val r = (sx: String, sy: String, sxy: String, sxx: String, syy: String) =>
        D.oR4(s"(n * $sxy - $sx * $sy) / " +
          s"sqrt((n * $sxx - $sx * $sx) * (n * $syy - $sy * $sy))")
      s"""WITH st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
            ${D.oSumDec("l_quantity")} AS sq,
            ${D.oSumDec("l_extendedprice")} AS sp,
            ${D.oSumDec("l_discount")} AS sd,
            ${q2("l_quantity", "l_quantity")} AS sqq,
            ${q2("l_extendedprice", "l_extendedprice")} AS spp,
            ${q2("l_discount", "l_discount")} AS sdd,
            ${q2("l_quantity", "l_extendedprice")} AS sqp,
            ${q2("l_quantity", "l_discount")} AS sqd,
            ${q2("l_extendedprice", "l_discount")} AS spd
          FROM lineitem)
          SELECT col_a, col_b, r FROM (
            SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                   ${r("sq", "sp", "sqp", "sqq", "spp")} AS r FROM st
            UNION ALL
            SELECT 'l_quantity', 'l_discount',
                   ${r("sq", "sd", "sqd", "sqq", "sdd")} FROM st
            UNION ALL
            SELECT 'l_extendedprice', 'l_discount',
                   ${r("sp", "sd", "spd", "spp", "sdd")} FROM st)
          ORDER BY col_a, col_b"""
    },

    "agg_revenue_pareto" ->
      s"""WITH rev AS (SELECT o_custkey,
                        SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
                      FROM orders GROUP BY 1),
          d AS (SELECT o_custkey, rev,
                  ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
                FROM rev),
          per AS (SELECT decile, count(*) AS n_customers, SUM(rev) AS drev
                  FROM d GROUP BY 1),
          t AS (SELECT SUM(drev) AS trev FROM per),
          c AS (SELECT decile, n_customers, drev,
                  SUM(drev) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS crev
                FROM per)
          SELECT decile, n_customers,
                 ${D.oR4("CAST(drev AS DOUBLE)")} AS revenue,
                 ${D.oR4("CAST(drev AS DOUBLE) / CAST(trev AS DOUBLE)")} AS share,
                 ${D.oR4("CAST(crev AS DOUBLE) / CAST(trev AS DOUBLE)")} AS cum_share
          FROM c CROSS JOIN t ORDER BY decile""",
    "agg_hash_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${D.oSumDec("l_quantity")} AS sum_qty,
            ${D.oSumDec("l_extendedprice")} AS sum_base_price,
            ${D.oSumDec("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
            ${D.oAvgDec("l_quantity")} AS avg_qty,
            ${D.oAvgDec("l_discount")} AS avg_disc,
            count(1) AS count_order
          FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "agg_global" ->
      s"""SELECT ${D.oSumDec("l_extendedprice")} AS sum_price,
            ${D.oAvgDec("l_quantity")} AS avg_qty, count(1) AS n,
            min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
          FROM lineitem""",

    "agg_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(1) AS n
         FROM events GROUP BY 1 ORDER BY 1""",

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
            CAST(grouping(l_returnflag) AS BIGINT) AS g_rf, CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
            count(1) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "agg_rollup" ->
      s"""SELECT r_name, n_name, count(1) AS customers, ${D.oSumDec("c_acctbal")} AS acctbal
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP (r_name, n_name)
          ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",

    "agg_cube" ->
      s"""SELECT event_type, (epoch_ns(ts) // 86400000000000) * 86400000 AS day_ms,
            count(1) AS n, ${D.oSumDec("value")} AS sum_value
          FROM events
          GROUP BY CUBE (1, 2)
          ORDER BY event_type NULLS FIRST, day_ms NULLS FIRST""",

    "agg_first_last" ->
      """WITH e AS (
           SELECT user_id, event_id, value, epoch_ns(ts) // 1000000 AS ts_ms FROM events),
         r AS (
           SELECT user_id, value,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn_a,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn_d
           FROM e)
         SELECT user_id,
                max(CASE WHEN rn_a = 1 THEN value END) AS first_value,
                max(CASE WHEN rn_d = 1 THEN value END) AS last_value,
                count(1) AS n
         FROM r GROUP BY 1 ORDER BY 1""",

    "agg_percentile_exact" ->
      """WITH q AS (SELECT event_type, quantile_cont(value, [0.5, 0.95, 0.99]) AS pct
                    FROM events GROUP BY 1)
         SELECT event_type, ROUND(pct[1] * 10000.0, 0) / 10000.0 + 0.0 AS p50,
                ROUND(pct[2] * 10000.0, 0) / 10000.0 + 0.0 AS p95,
                ROUND(pct[3] * 10000.0, 0) / 10000.0 + 0.0 AS p99
         FROM q ORDER BY 1""",

    "agg_stddev_var" ->
      s"""SELECT l_returnflag, ${D.oStddevSampDec("l_extendedprice")} AS sd,
            ${D.oVarSampDec("l_extendedprice")} AS vr
          FROM lineitem GROUP BY 1 ORDER BY 1""",

    // mirror of agg_hll_merge: same register derivation, merged by
    // bucket-wise max before ONE global estimate
    "agg_hll_merge" ->
      """WITH h AS (SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
         b AS (SELECT event_type,
                 (instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 +
                 (instr('0123456789abcdef', substr(hx, 2, 1)) - 1) AS bucket,
                 ltrim(substr(hx, 3, 12), '0') AS t
               FROM h),
         r AS (SELECT event_type, bucket,
                 CASE WHEN t = '' THEN 49
                      ELSE (12 - length(t)) * 4 +
                           CASE WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 8 THEN 0
                                WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 4 THEN 1
                                WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 2 THEN 2
                                ELSE 3 END + 1 END AS rho
               FROM b),
         pg AS (SELECT event_type, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
         regs AS (SELECT bucket, max(m) AS m FROM pg GROUP BY 1),
         est AS (SELECT SUM(CAST(1 AS BIGINT) << (49 - m)) AS s_present,
                        COUNT(*) AS nb
                 FROM regs),
         fin AS (SELECT s_present + (256 - nb) * CAST(562949953421312 AS BIGINT) AS s_all,
                        256 - nb AS v
                 FROM est),
         er AS (SELECT v,
                  (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 562949953421312.0
                    / CAST(s_all AS DOUBLE) AS e_raw
                FROM fin),
         ex AS (SELECT count(DISTINCT user_id) AS exact_users FROM events)
         SELECT ROUND((CASE WHEN er.e_raw <= 640.0 AND er.v > 0
                            THEN 256.0 * ln(256.0 / er.v) ELSE er.e_raw END)
                      * 10000.0, 0) / 10000.0 + 0.0 AS approx_users,
                ex.exact_users
         FROM er, ex""",

    "agg_approx_distinct_hll" ->
      """WITH h AS (SELECT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS hx FROM events),
         b AS (SELECT event_type,
                 (instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16 +
                 (instr('0123456789abcdef', substr(hx, 2, 1)) - 1) AS bucket,
                 ltrim(substr(hx, 3, 12), '0') AS t
               FROM h),
         r AS (SELECT event_type, bucket,
                 CASE WHEN t = '' THEN 49
                      ELSE (12 - length(t)) * 4 +
                           CASE WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 8 THEN 0
                                WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 4 THEN 1
                                WHEN instr('0123456789abcdef', substr(t, 1, 1)) - 1 >= 2 THEN 2
                                ELSE 3 END + 1 END AS rho
               FROM b),
         regs AS (SELECT event_type, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
         est AS (SELECT event_type,
                   SUM(CAST(1 AS BIGINT) << (49 - m)) AS s_present,
                   COUNT(*) AS nb
                 FROM regs GROUP BY 1),
         fin AS (SELECT event_type,
                   s_present + (256 - nb) * CAST(562949953421312 AS BIGINT) AS s_all,
                   256 - nb AS v
                 FROM est),
         er AS (SELECT event_type, v,
                  (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 562949953421312.0 / CAST(s_all AS DOUBLE) AS e_raw
                FROM fin),
         ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users FROM events GROUP BY 1)
         SELECT er.event_type,
                ROUND((CASE WHEN er.e_raw <= 640.0 AND er.v > 0
                            THEN 256.0 * ln(256.0 / er.v) ELSE er.e_raw END) * 10000.0, 0) / 10000.0 + 0.0 AS approx_users,
                ex.exact_users
         FROM er JOIN ex ON ex.event_type = er.event_type
         ORDER BY er.event_type""",

    "agg_collect_sorted" ->
      """SELECT user_id,
            array_to_string(list(epoch_ns(ts) // 1000000 ORDER BY epoch_ns(ts) // 1000000), '|') AS ts_list,
            count(1) AS n
         FROM events GROUP BY 1 ORDER BY 1""",

    "agg_sum_distinct" ->
      """SELECT l_returnflag,
            CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_dq
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "agg_pivot" ->
      """SELECT user_id,
            CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
            CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
            CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         FROM events GROUP BY 1 ORDER BY 1""",

    "agg_listagg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation GROUP BY 1 ORDER BY 1""",

    "fn_unpivot" ->
      """WITH wide AS (
           SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
           FROM events GROUP BY 1)
         SELECT user_id, 'click' AS etype, click AS n FROM wide
         UNION ALL SELECT user_id, 'view' AS etype, view AS n FROM wide
         ORDER BY user_id, etype""",

    "agg_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS c
                    FROM lineitem GROUP BY 1, 2),
         r AS (SELECT l_returnflag, l_quantity, c,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY c DESC, l_quantity ASC) AS rn
               FROM c)
         SELECT l_returnflag, l_quantity AS mode_qty, c AS n
         FROM r WHERE rn = 1 ORDER BY l_returnflag""",

    "sub_correlated_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders o
         WHERE o_totalprice > (SELECT ROUND((CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                             / COUNT(1)) * 10000.0, 0) / 10000.0 + 0.0
                               FROM orders i WHERE i.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",

    "agg_filtered" ->
      """SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS qty_taxed,
           COUNT(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00') AS n_recent
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "sub_exists" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",

    "sub_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
           AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                                  WHERE l_discount > 0.08)
         ORDER BY o_orderkey""",

    "agg_custom_typed" ->
      s"""SELECT l_returnflag,
            ${D.oR4(s"${D.oSumDec("l_extendedprice * l_quantity")} / ${D.oSumDec("l_quantity")}")} AS wavg_price
          FROM lineitem GROUP BY 1 ORDER BY 1"""
  )
}
