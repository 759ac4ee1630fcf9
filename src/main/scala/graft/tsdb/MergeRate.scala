package graft.tsdb

import graft.core.D
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-series merge + rate conversion — the second and third stages of
  * the mycenae query pipeline (downsample → merge → rate).
  */
object MergeRate {

  /** Merge: aggregate across series at aligned buckets, grouped by the
    * chosen tags. Tags NOT in `groupTags` disappear (they are what the
    * OpenTSDB response calls `aggregateTags`). A second hash aggregate —
    * partial/final split is automatic, and since the downsample already
    * shrank the data to (series × bucket) rows, this shuffle is small. */
  def merge(downsampled: DataFrame, groupTags: Seq[String],
            aggregator: String): DataFrame = {
    // first/last are PER-SERIES downsample aggregators; across series at
    // one aligned bucket there is no time order to pick "first" by, so
    // min_by/max_by over the (constant) bucket key would be arbitrary
    require(aggregator != "first" && aggregator != "last",
      s"'$aggregator' is a downsample aggregator; merge needs an " +
        "associative cross-series aggregator (sum/avg/min/max/count)")
    val keys = groupTags.map(col) :+ col("bucket_ms")
    // OpenTSDB semantics: a NaN-filled (missing) point is SKIPPED by the
    // cross-series aggregator. Without this filter NaN poisons the merge:
    // dec(NaN) → NULL drops it from sums but count(value) still counts
    // it (inflating avg denominators), and max() ranks NaN above every
    // double. A bucket missing in ALL series emits no merged point.
    downsampled.where(col("value").isNull || !isnan(col("value")))
      .groupBy(keys: _*)
      .agg(Downsample.aggExpr(aggregator, col("value"), col("bucket_ms")).as("value"))
  }

  /** Per-series rate: (v − v_prev) / Δt_seconds over bucket order. One
    * window shuffle partitioned by the series key; when it follows a merge
    * grouped on the same keys, AQE/exchange-reuse keeps it cheap. */
  def rate(df: DataFrame, seriesCols: Seq[String],
           opts: RateOptions = RateOptions(),
           bucketCol: String = "bucket_ms", valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(bucketCol))
    val prevV = lag(col(valueCol), 1).over(w)
    val prevT = lag(col(bucketCol), 1).over(w)
    val rawDelta = col(valueCol) - prevV
    // OpenTSDB rateOptions: counter wrap (delta<0 → += counterMax) and
    // reset-spike suppression (delta>resetValue → null).
    val delta0: Column = if (opts.counter) {
      val wrapped = opts.counterMax
        .map(m => when(rawDelta < 0, rawDelta + lit(m.toDouble)).otherwise(rawDelta))
        .getOrElse(when(rawDelta < 0, lit(null)).otherwise(rawDelta))
      opts.resetValue
        .map(r => when(wrapped > lit(r.toDouble), lit(null)).otherwise(wrapped))
        .getOrElse(wrapped)
    } else rawDelta
    val dtSec = (col(bucketCol) - prevT).cast("double") / 1000.0
    df.withColumn("rate",
      when(prevT.isNull, lit(null)).otherwise(graft.core.D.r4s(delta0 / dtSec)))
  }
}
