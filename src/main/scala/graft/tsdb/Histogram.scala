package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OpenTSDB 2.4-style histogram metrics: raw values are folded into
  * fixed-width (bin, count) vectors per (series, bucket) at ingest,
  * and everything downstream — merging across series, percentile
  * extraction — is exact integer arithmetic over pre-aggregated
  * counts. That's the only shape that keeps cross-series percentiles
  * cheap at 100 TB: a raw-value percentile needs the full value
  * multiset shuffled to one place, a histogram percentile needs
  * ≤ nBins rows per group, and counts add associatively so every
  * stage is partial-agg friendly (map-side combine everywhere).
  * Resolution is the bin width — the standard histogram trade.
  */
object Histogram {

  /** Fold points into per-(series, bucket) histogram counts: bin =
    * floor(value / binWidth) clamped to nBins-1. One hash aggregate,
    * map-side combinable. */
  def build(points: DataFrame, seriesCols: Seq[String], intervalMs: Long,
            binWidth: Double, nBins: Int, tsMsCol: String = "ts_ms",
            valueCol: String = "value"): DataFrame = {
    val bucket = Downsample.bucketMs(col(tsMsCol), intervalMs).as("bucket_ms")
    val bin = least(floor(col(valueCol) / binWidth).cast("long"),
      lit(nBins - 1L)).as("bin")
    points
      .groupBy((seriesCols.map(col) :+ bucket :+ bin): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histograms across series — vector addition (counts sum; the
    * dropped series columns are what's being merged away). */
  def merge(hist: DataFrame, groupCols: Seq[String]): DataFrame =
    hist.groupBy((groupCols.map(col) :+ col("bucket_ms") :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Percentile from a merged histogram: the smallest bin whose
    * cumulative count reaches q (exact integer comparison —
    * `cum * 100 >= pct * total`, no float thresholds), emitted as the
    * bin's lower edge. Two windows + one min over ≤ nBins rows per
    * (group, bucket). `pct` is an integer percent (95 → p95). */
  def percentile(merged: DataFrame, groupCols: Seq[String], pct: Int,
                 binWidth: Double): DataFrame = {
    val keys = groupCols.map(col) :+ col("bucket_ms")
    val ordered = Window.partitionBy(keys: _*).orderBy(col("bin"))
    val whole = Window.partitionBy(keys: _*)
    merged
      .withColumn("cum", sum(col("cnt")).over(ordered))
      .withColumn("total", sum(col("cnt")).over(whole))
      .where(col("cum") * 100 >= lit(pct) * col("total"))
      .groupBy(keys: _*)
      .agg((min(col("bin")) * binWidth).as(s"p$pct"))
  }

  // ---------------------------------------------------------------------
  // DDSketch-style log-bucket quantile sketch (Masson/Rim/Lee, "DDSketch:
  // A Fast and Fully-Mergeable Quantile Sketch with Relative-Error
  // Guarantees", VLDB 2019 — public paper). Fixed-width histograms above
  // bound ABSOLUTE error, which collapses on long-tailed latency data;
  // geometric buckets idx = ceil(log_γ v) put every value within
  // α = (γ−1)/(γ+1) RELATIVE error of the bucket estimate 2γ^idx/(γ+1),
  // which is why this is the sketch shape production metric stores serve
  // p99s from. Counts add associatively → sketches merge bucket-wise
  // exactly like the fixed histograms, every stage is map-side
  // combinable, and sketch size is ≤ log_γ(max/min) buckets per series
  // REGARDLESS of point count (~580 buckets for a 10⁵ dynamic range at
  // γ=1.02 / α≈1%) — the raw-value alternative shuffles the full value
  // multiset. Non-positive values take a reserved bucket (estimate 0.0),
  // mirroring the paper's zero-store.
  //
  // Cross-engine determinism: the log-ratio is 4dp-quantized BEFORE ceil
  // and the pow-based estimate after (D.r4s / oR4 — the documented
  // ULP-tie risk class shared by every r4 site).
  // ---------------------------------------------------------------------

  /** Reserved bucket index for values ≤ 0 (sorts below every real
    * bucket, so cumulative walks see it first — rank order preserved). */
  val DdZeroIdx = -1000000L

  /** Fold points into per-(series, bucket) DDSketch buckets: one hash
    * aggregate, map-side combinable. */
  def ddsketchBuild(points: DataFrame, seriesCols: Seq[String],
                    intervalMs: Long, gamma: Double,
                    tsMsCol: String = "ts_ms",
                    valueCol: String = "value"): DataFrame = {
    val bucket = Downsample.bucketMs(col(tsMsCol), intervalMs).as("bucket_ms")
    val idx = when(col(valueCol) > 0,
      ceil(graft.core.D.r4s(log(col(valueCol)) / math.log(gamma))).cast("long"))
      .otherwise(lit(DdZeroIdx)).as("idx")
    points
      .groupBy((seriesCols.map(col) :+ bucket :+ idx): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches across series — bucket-wise count addition (the
    * dropped series columns are what's merged away). */
  def ddsketchMerge(sk: DataFrame, groupCols: Seq[String]): DataFrame =
    sk.groupBy((groupCols.map(col) :+ col("bucket_ms") :+ col("idx")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a merged sketch, one row per requested
    * integer percent: smallest bucket whose cumulative count reaches
    * the rank (exact integer threshold, house percentile rule), value
    * estimate = 2γ^idx/(γ+1) quantized 4dp. Two windows over ≤
    * bucket-count rows per group, then a pct fan-out of that reduced
    * set — no pass ever revisits the points. */
  def ddsketchPercentiles(merged: DataFrame, groupCols: Seq[String],
                          pcts: Seq[Int], gamma: Double): DataFrame = {
    val keys = groupCols.map(col) :+ col("bucket_ms")
    val ordered = Window.partitionBy(keys: _*).orderBy(col("idx"))
    val whole = Window.partitionBy(keys: _*)
    merged
      .withColumn("cum", sum(col("cnt")).over(ordered))
      .withColumn("total", sum(col("cnt")).over(whole))
      .select((keys :+ col("idx") :+ col("cum") :+ col("total") :+
        explode(array(pcts.map(p => lit(p.toLong)): _*)).as("pct")): _*)
      .where(col("cum") * 100 >= col("pct") * col("total"))
      .groupBy((keys :+ col("pct")): _*)
      .agg(min(col("idx")).as("idx"))
      .select((keys :+ col("pct") :+
        when(col("idx") === DdZeroIdx, lit(0.0))
          .otherwise(graft.core.D.r4s(
            lit(2.0) * pow(lit(gamma), col("idx")) / lit(gamma + 1.0)))
          .as("est")): _*)
  }
}
