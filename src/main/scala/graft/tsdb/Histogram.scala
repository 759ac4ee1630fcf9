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
}
