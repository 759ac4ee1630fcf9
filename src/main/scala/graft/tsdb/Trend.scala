package graft.tsdb

import graft.core.D
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trend analytics over downsampled series: trapezoidal integration,
  * least-squares trend / forecast, sliding-window median. All three are
  * per-series computations — each shape is either one aggregate per
  * series (integral, fit: the shuffle moves one row per series, never
  * points) or one window over a series' own buckets (median: state is
  * the window frame, bounded by the window length). Nothing here joins
  * back to raw points or sorts globally, so every operator scales with
  * series cardinality, not corpus size.
  */
object Trend {

  /** Trapezoidal area under each series' (bucket_ms, value) polyline,
    * expressed in value·hours: Σ (vᵢ₋₁ + vᵢ)/2 · Δtᵢ over consecutive
    * buckets. One lag window per series (frame = 1 row) feeding a
    * decimal-exact sum — the trapezoid terms are quantized to 4dp
    * decimals BEFORE the sum, so the total is shuffle-order-independent
    * (the [[D.dec]] contract; a double sum here would hash-differ run
    * to run). Series with a single bucket integrate to 0 area but are
    * still emitted (n_traps = 0) — silence and "no data" must stay
    * distinguishable in a dashboard. */
  def integral(downsampled: DataFrame, seriesCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy("bucket_ms")
    val pv = lag(col("value"), 1).over(w)
    val pb = lag(col("bucket_ms"), 1).over(w)
    val hours = (col("bucket_ms") - pb).cast("double") / lit(3600000.0)
    val trap = (pv + col("value")) / lit(2.0) * hours
    downsampled
      .withColumn("trap", when(pb.isNotNull, D.dec(trap)))
      .groupBy(seriesCols.map(col): _*)
      .agg(sum(col("trap")).cast("double").as("auc_raw"),
        count(col("trap")).as("n_traps"))
      .select(seriesCols.map(col) ++ Seq(
        coalesce(D.r4s(col("auc_raw")), lit(0.0)).as("auc"),
        col("n_traps")): _*)
  }

  /** Per-series ordinary-least-squares trend over (x = bucket index in
    * `unitMs` units from the series' first bucket, y = value), plus the
    * fitted value `horizon` units past the last bucket — the
    * dashboard "where is this metric heading" query.
    *
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept = ȳ − slope·x̄,
    * from sufficient statistics only: x stays an exact LONG bucket
    * index (so Σx, Σx² are integer-exact) and y a DECIMAL(18,4) (so Σy
    * and Σxy — a decimal×long product — are decimal-exact), making the
    * aggregate shuffle-order-independent with no wide-decimal precision
    * games; the division happens once per series in double,
    * 4dp-rounded. Series need ≥ 2 distinct buckets (which guarantees
    * positive x-variance) — singletons are dropped, a line through one
    * point is noise. */
  def linearFit(downsampled: DataFrame, seriesCols: Seq[String],
                unitMs: Long, horizon: Int): DataFrame = {
    val wMin = Window.partitionBy(seriesCols.map(col): _*)
    val x = ((col("bucket_ms") - min(col("bucket_ms")).over(wMin)) / lit(unitMs))
      .cast("long")
    val y = col("value").cast(DecimalType(18, 4))
    val fit = downsampled
      .select(seriesCols.map(col) ++ Seq(x.as("x"), y.as("y")): _*)
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        max(col("x")).cast("double").as("xmax"))
      .where(col("n") >= 2)
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val intercept = (col("sy") - slope * col("sx")) / col("n")
    fit.select(seriesCols.map(col) ++ Seq(
      col("n").cast("long").as("n_buckets"),
      D.r4s(slope).as("slope"),
      D.r4s(intercept).as("intercept"),
      D.r4s(intercept + slope * (col("xmax") + lit(horizon.toDouble)))
        .as("forecast")): _*)
  }

  /** Holt double-exponential smoothing (level + linear trend) per
    * series: l₁ = x₁, b₁ = 0; lᵢ = α·xᵢ + (1−α)(lᵢ₋₁ + bᵢ₋₁),
    * bᵢ = β(lᵢ − lᵢ₋₁) + (1−β)bᵢ₋₁. Like [[Downsample.ewma]], the
    * sequential recurrence is folded PER PREFIX with the aggregate
    * HOF so both engines associate left-to-right over an identically
    * sorted list — that, not a window re-association, is what makes a
    * two-state recurrence hash-portable. α and β should be
    * binary-exact (0.5, 0.25…) so the literals carry no decimal
    * drift; the lᵢ expression is deliberately written out twice in
    * the bᵢ term (fold lambdas bind no local names — both engines
    * evaluate the duplicate identically). Emits per-bucket 4dp level
    * and trend. Quadratic in each series' bucket count like ewma —
    * the bucket list is a downsampled grid (bounded), never raw
    * points. */
  def holt(downsampled: DataFrame, seriesCols: Seq[String],
           alpha: Double, beta: Double): DataFrame = {
    // O(n) typed scan per series (r12; the Downsample.ewma rewrite's
    // twin — the r11 per-prefix transform × aggregate-over-slice was
    // O(n²) in per-series buckets). Same raw (l, b) double chain —
    // lNew = αx + (1−α)(l+b), bNew = β(lNew−l) + (1−β)b, seeded
    // (v₁, 0) — same sort order, 4dp only at emission (D.r4d); the
    // per-prefix list_reduce oracle text is unchanged.
    val s = downsampled.sparkSession
    import s.implicits._
    val keySchema = org.apache.spark.sql.types.StructType(
      seriesCols.map(c => downsampled.schema(c)))
    val packed = downsampled.select(
      to_json(struct(seriesCols.map(col): _*)).as("k"),
      col("bucket_ms"), col("value")).as[(String, Long, Double)]
    val a1 = 1.0 - alpha; val b1 = 1.0 - beta
    val out = packed.groupByKey(_._1).flatMapGroups { (k, it) =>
      val pts = it.toArray.sortBy(p => (p._2, p._3))
      var l = 0.0; var b = 0.0
      var first = true
      pts.iterator.map { case (_, bkt, v) =>
        if (first) { first = false; l = v; b = 0.0 }
        else {
          val lNew = alpha * v + a1 * (l + b)
          b = beta * (lNew - l) + b1 * b
          l = lNew
        }
        (k, bkt, graft.core.D.r4d(l), graft.core.D.r4d(b))
      }
    }.toDF("k", "bucket_ms", "level", "trend")
    out.select(from_json(col("k"), keySchema).as("ks") +:
        col("bucket_ms") +: col("level") +: col("trend") +: Nil: _*)
      .select(seriesCols.map(c => col(s"ks.$c").as(c)) ++
        Seq(col("bucket_ms"), col("level"), col("trend")): _*)
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
    * THE display-downsample: reduce each series to `k` visually
    * faithful points (first + last always kept; each of the k−2 middle
    * buckets contributes the point forming the largest triangle with
    * the PREVIOUSLY SELECTED point and the NEXT bucket's average).
    *
    * The parallel/sequential split is the whole design: bucket
    * assignment, per-bucket candidate lists, bucket averages, and each
    * bucket's "next" anchor (lead of the averages; the real last point
    * for the final bucket) are all PLAIN COLUMN WORK — shuffled once,
    * co-partitioned per series — and only the selection walk (which
    * depends on the previous pick) runs as the established portable
    * fold, over k-sized state. Fold shapes match the oracle exactly:
    * flat double lists ([nx, ny, ts₁, v₁, ts₂, v₂, …] per bucket;
    * state = [prev_ts, prev_val, chosen…]), the inner per-bucket
    * arg-max folds an index sequence over the bucket pairs with the
    * triangle area 4dp-quantized before the strict-> compare (ties →
    * earliest candidate). Series shorter than k+1 buckets are excluded
    * by the mirrored n > k guard. Per-series cost: O(n) column work +
    * O(k · bucket) fold steps — the grid is bounded, never raw points. */
  def lttb(downsampled: DataFrame, seriesCols: Seq[String], k: Int): DataFrame = {
    require(k >= 3, "lttb needs at least first + one middle + last")
    val sc = seriesCols.map(col)
    val wOrd = Window.partitionBy(sc: _*).orderBy("bucket_ms")
    val wAll = Window.partitionBy(sc: _*)
    val pts = downsampled
      .withColumn("i", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .where(col("n") > k)
    val ends = pts.groupBy(sc: _*).agg(
      min(when(col("i") === 1,
        struct(col("bucket_ms"), col("value")))).as("fp"),
      min(when(col("i") === col("n"),
        struct(col("bucket_ms"), col("value")))).as("lp"))
    val mid = pts.where(col("i") > 1 && col("i") < col("n"))
      .withColumn("j",
        expr(s"CAST(((i - 2) * ${k - 2}) DIV (n - 2) AS INT) + 1"))
    val buckets = mid.groupBy(sc :+ col("j"): _*).agg(
      D.r4s(sum(D.dec(col("bucket_ms"))).cast("double") / count(lit(1))).as("bx"),
      D.r4s(sum(D.dec(col("value"))).cast("double") / count(lit(1))).as("by"),
      flatten(transform(
        sort_array(collect_list(struct(col("bucket_ms"), col("value")))),
        p => array(p.getField("bucket_ms").cast("double"),
          p.getField("value")))).as("flat"))
    val withNext = buckets
      .join(ends, seriesCols)
      .withColumn("nx", coalesce(lead(col("bx"), 1).over(
        Window.partitionBy(sc: _*).orderBy("j")),
        col("lp.bucket_ms").cast("double")))
      .withColumn("ny", coalesce(lead(col("by"), 1).over(
        Window.partitionBy(sc: _*).orderBy("j")), col("lp.value")))
      .withColumn("el", concat(array(col("nx"), col("ny")), col("flat")))
    val arr = withNext.groupBy(sc: _*).agg(
      min(col("fp")).as("fp"), min(col("lp")).as("lp"),
      transform(sort_array(collect_list(struct(col("j"), col("el")))),
        s => s.getField("el")).as("els"))
    val init = array(col("fp.bucket_ms").cast("double"), col("fp.value"),
      col("fp.bucket_ms").cast("double"), col("fp.value"))
    val st = aggregate(col("els"), init, (acc, e) => {
      val best = aggregate(
        sequence(lit(3), size(e) - 1, lit(2)),
        array(lit(-1.0), lit(0.0), lit(0.0)),
        (b, p) => {
          val ct = element_at(e, p)
          val cv = element_at(e, p + lit(1))
          val area = D.r4s(abs(
            (element_at(acc, 1) - element_at(e, 1)) * (cv - element_at(acc, 2)) -
            (element_at(acc, 1) - ct) * (element_at(e, 2) - element_at(acc, 2))))
          when(area > element_at(b, 1), array(area, ct, cv)).otherwise(b)
        })
      concat(array(element_at(best, 2), element_at(best, 3)),
        slice(acc, lit(3), size(acc) - 2),
        array(element_at(best, 2), element_at(best, 3)))
    })
    val chosen = concat(slice(st, lit(3), size(st) - 2),
      array(col("lp.bucket_ms").cast("double"), col("lp.value")))
    arr.withColumn("ch", chosen)
      .select(sc :+ posexplode(
        transform(sequence(lit(1), (size(col("ch")) / lit(2)).cast("int")), q =>
          struct(element_at(col("ch"), q * 2 - 1).as("ts"),
            element_at(col("ch"), q * 2).as("v")))).as(Seq("p", "s")): _*)
      .select(sc ++ Seq((col("p") + 1).cast("long").as("sel_idx"),
        col("s.ts").cast("long").as("ts_ms"), col("s.v").as("value")): _*)
  }

  /** Additive Holt–Winters (level + trend + weekly seasonality,
    * α=β=γ=0.5 binary-exact, zero-init) per series — the
    * seasonality-aware smoother/forecaster. `fitted` is the one-step-
    * ahead prediction BEFORE the bucket's own update (l + b + s_j), so
    * residuals are honest.
    *
    * Portability is the ewma/holt playbook taken to a 10-slot state:
    * the state rides as a FLAT double array [l, b, fitted, s₀..s₆] and
    * fold inputs as [x, j] pairs (j = 0-based position mod 7), because
    * DuckDB's list_reduce mis-evaluates struct accumulators (the
    * tsdb_holt finding) but folds flat lists exactly; the seasonal
    * slot update is an INDEX-REBUILT list over range(0,7) on both
    * engines (no indexed-lambda support assumed), and the lᵢ
    * expression is duplicated inside bᵢ/sᵢ exactly as written here.
    * Per-prefix O(n²) like ewma over the (bounded) downsample grid. */
  def holtWinters(downsampled: DataFrame, seriesCols: Seq[String],
                  period: Int = 7): DataFrame = {
    // O(n·period) typed scan per series (r12; the per-prefix HOF fold
    // re-ran the whole (period+3)-slot recurrence per output row —
    // O(n²·period)). Same zero-seeded chain — the FIRST point goes
    // through the merge like every other (unlike ewma/holt's
    // value-seed) — same additive-seasonal updates, 4dp only at
    // emission (D.r4d); oracle text unchanged.
    val s = downsampled.sparkSession
    import s.implicits._
    val keySchema = org.apache.spark.sql.types.StructType(
      seriesCols.map(c => downsampled.schema(c)))
    val packed = downsampled.select(
      to_json(struct(seriesCols.map(col): _*)).as("k"),
      col("bucket_ms"), col("value")).as[(String, Long, Double)]
    val out = packed.groupByKey(_._1).flatMapGroups { (k, it) =>
      val pts = it.toArray.sortBy(p => (p._2, p._3))
      val season = new Array[Double](period) // zeros, like the HOF init
      var l = 0.0; var b = 0.0
      var idx = 0
      pts.iterator.map { case (_, bkt, x) =>
        val j = idx % period
        val sj = season(j)
        val lN = 0.5 * (x - sj) + 0.5 * (l + b)
        val bN = 0.5 * (lN - l) + 0.5 * b
        val fit = l + b + sj
        season(j) = 0.5 * (x - lN) + 0.5 * sj
        l = lN; b = bN
        idx += 1
        (k, bkt, D.r4d(l), D.r4d(b), D.r4d(fit))
      }
    }.toDF("k", "bucket_ms", "level", "trend", "fitted")
    out.select(from_json(col("k"), keySchema).as("ks") +: col("bucket_ms") +:
        col("level") +: col("trend") +: col("fitted") +: Nil: _*)
      .select(seriesCols.map(c => col(s"ks.$c").as(c)) ++ Seq(
        col("bucket_ms"), col("level"), col("trend"), col("fitted")): _*)
  }

  /** One-sided CUSUM drift detector per series (Page's cumulative-sum
    * control chart): s₀ = 0; sᵢ = max(0, sᵢ₋₁ + xᵢ − μ − κ), alarm
    * when sᵢ > h. Self-scaling parameters — μ is the series' own
    * decimal-exact 4dp mean, the slack κ = μ/4 and the threshold
    * h = μ — so one query works across metrics of any magnitude.
    * Portability exactly as [[Downsample.ewma]]: the inherently
    * sequential recurrence is folded per prefix with the aggregate
    * HOF (explicit 0 seed; the oracle prepends the same 0 to its
    * list_reduce), left-to-right over an identically sorted bucket
    * list. Alarm is emitted as an int (already-4dp cusum vs
    * already-4dp h — an exact comparison on both engines). Quadratic
    * in each series' bucket count like ewma — grid-sized, never raw
    * points. */
  def cusum(downsampled: DataFrame, seriesCols: Seq[String]): DataFrame = {
    // O(n) typed scan per series (r12; was per-prefix O(n²)). μ stays
    // a COLUMN computation (exact decimal window sum / count, r4) so
    // its cross-engine semantics are untouched; it rides into the fold
    // as a per-row constant. Same zero-seeded max(0, acc+x−μ−μ/4)
    // chain, r4 only at emission; oracle text unchanged.
    val s = downsampled.sparkSession
    import s.implicits._
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val keySchema = org.apache.spark.sql.types.StructType(
      seriesCols.map(c => downsampled.schema(c)))
    val packed = downsampled
      .withColumn("mu", D.r4s(sum(D.dec(col("value"))).over(wAll)
        .cast("double") / count(lit(1)).over(wAll)))
      .select(to_json(struct(seriesCols.map(col): _*)).as("k"),
        col("bucket_ms"), col("value"), col("mu"))
      .as[(String, Long, Double, Double)]
    val out = packed.groupByKey(_._1).flatMapGroups { (k, it) =>
      val pts = it.toArray.sortBy(p => (p._2, p._3))
      val mu = pts.head._4
      var acc = 0.0
      pts.iterator.map { case (_, bkt, v, _) =>
        acc = math.max(acc + v - mu - mu * 0.25, 0.0)
        (k, bkt, D.r4d(acc), if (D.r4d(acc) > mu) 1 else 0)
      }
    }.toDF("k", "bucket_ms", "cusum", "alarm")
    out.select(from_json(col("k"), keySchema).as("ks") +: col("bucket_ms") +:
        col("cusum") +: col("alarm") +: Nil: _*)
      .select(seriesCols.map(c => col(s"ks.$c").as(c)) ++ Seq(
        col("bucket_ms"), col("cusum"), col("alarm")): _*)
  }

  /** Largest level shift per series (two-segment changepoint): the
    * split index maximizing |mean(left) − mean(right)| over the
    * series' buckets — the "when did this metric move" query. Prefix
    * decimal sums via one window pass make every candidate split's
    * two means exact-arithmetic; the per-series arg-max is a second
    * window over bucket-count rows (gap desc, then EARLIER bucket on
    * ties). Series need ≥ 2 buckets. Emits the last left-segment
    * bucket as `split_ms` plus both 4dp means and segment sizes. */
  def changepoint(downsampled: DataFrame, seriesCols: Seq[String]): DataFrame = {
    val wOrd = Window.partitionBy(seriesCols.map(col): _*).orderBy("bucket_ms")
    val wAll = Window.partitionBy(seriesCols.map(col): _*)
    val pre = downsampled
      .withColumn("idx", row_number().over(wOrd).cast("double"))
      .withColumn("cum", sum(D.dec(col("value")))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double"))
      .withColumn("n", count(lit(1)).over(wAll).cast("double"))
      .withColumn("tot", sum(D.dec(col("value"))).over(wAll).cast("double"))
      .where(col("idx") < col("n"))
    val meanL = col("cum") / col("idx")
    val meanR = (col("tot") - col("cum")) / (col("n") - col("idx"))
    val cand = pre.select(seriesCols.map(col) ++ Seq(
      col("bucket_ms"), col("idx"), col("n"),
      D.r4s(meanL).as("mean_left"), D.r4s(meanR).as("mean_right"),
      D.r4s(abs(meanL - meanR)).as("gap")): _*)
    val wBest = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col("gap").desc, col("bucket_ms"))
    cand.withColumn("rn", row_number().over(wBest))
      .where(col("rn") === 1)
      .select(seriesCols.map(col) ++ Seq(col("bucket_ms").as("split_ms"),
        col("idx").cast("long").as("n_left"),
        (col("n") - col("idx")).cast("long").as("n_right"),
        col("mean_left"), col("mean_right"), col("gap")): _*)
  }

  /** Day-of-week seasonal profile + deseasonalized residual per series:
    * dow_mean is the series' average over same-weekday buckets (decimal
    * sums, 4dp), resid = value − dow_mean — the "is Monday always like
    * this" decomposition dashboards overlay before flagging anomalies.
    * One window per (series, weekday) partition over the series' own
    * grid rows — no join-back, no global pass; dow derives from the
    * epoch-day index (1970-01-01 was a Thursday; the +4 shift lands
    * Sunday on 0, Monday on 1, …). */
  def seasonalDow(downsampled: DataFrame, seriesCols: Seq[String]): DataFrame = {
    val withDow = downsampled.withColumn("dow",
      expr("CAST((bucket_ms DIV 86400000 + 4) % 7 AS INT)"))
    val w = Window.partitionBy((seriesCols :+ "dow").map(col): _*)
    val dowMean = D.r4s(sum(D.dec(col("value"))).over(w).cast("double") /
      count(lit(1)).over(w))
    withDow
      .withColumn("dow_mean", dowMean)
      .select(seriesCols.map(col) ++ Seq(col("bucket_ms"), col("value"),
        col("dow"), col("dow_mean"),
        D.r4s(col("value") - col("dow_mean")).as("resid")): _*)
  }

  /** Exact sliding-window median per series: the median of the trailing
    * `window` buckets (current row inclusive; ramp-up rows use however
    * many buckets exist). Implemented as a sorted collect_list over the
    * row frame — the buffer is bounded by `window` (a dashboard-sized
    * constant), so per-row state is O(window), never O(series). The
    * median is picked with the same explicit element formula on both
    * engines (odd n → middle element; even n → mean of the two middle
    * elements, 4dp-rounded) — no reliance on either engine's builtin
    * median interpolation flavor. */
  def movingMedian(downsampled: DataFrame, seriesCols: Seq[String],
                   window: Int): DataFrame = {
    require(window >= 1, "window must be at least one bucket")
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy("bucket_ms")
      .rowsBetween(-(window - 1), 0)
    val vs = sort_array(collect_list(col("value")).over(w))
    val n = size(vs)
    // int/int `/` is true division in Spark — cast back to int indexes
    // (operands are positive, so the truncating cast is a floor, the
    // exact mirror of the oracle's `//`)
    val mid = element_at(vs, ((n + lit(1)) / lit(2)).cast("int")).cast("double")
    val midHi = element_at(vs, (n / lit(2) + lit(1)).cast("int")).cast("double")
    val med = when(pmod(n, lit(2)) === 1, mid)
      .otherwise((mid + midHi) / lit(2.0))
    downsampled.select(seriesCols.map(col) ++ Seq(
      col("bucket_ms"), col("value"), D.r4s(med).as("median")): _*)
  }
}
