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

  /** OpenTSDB-faithful merge: each series is linearly INTERPOLATED to
    * the union of its group's timestamps before aggregating — the
    * reference interpolates a series to the other series' sample
    * times when they misalign, rather than dropping the bucket
    * ([[merge]] is the engine's bucket-aligned default; this variant
    * closes the interpolation semantics SURVEY §0 flags). Leading /
    * trailing gaps stay null (no extrapolation) and nulls vanish into
    * the aggregate, exactly as the reference skips a series outside
    * its sample range. Interpolated values are 4dp-quantized (D3)
    * BEFORE aggregation so the cross-series sum stays engine-exact.
    *
    * `seriesCols` is the full series identity and must contain
    * `groupTags`. Shuffle shape: one distinct per side of the
    * group-spine grid (reduced rows), one per-series window for the
    * lerp, then the same grouped aggregate as [[merge]] — no
    * corpus-sized join. */
  def mergeInterpolated(ds: DataFrame, seriesCols: Seq[String],
                        groupTags: Seq[String], aggregator: String): DataFrame = {
    require(groupTags.forall(seriesCols.contains),
      s"seriesCols $seriesCols must contain groupTags $groupTags")
    // NaN-filled buckets (fill="nan" upstream) must not become lerp
    // anchors — an NaN anchor would poison every interpolated neighbor
    // BEFORE merge()'s own NaN skip can drop it (ADVICE r6). Dropping
    // them here treats an NaN bucket exactly like the missing point it
    // encodes. Materialized once: the spine distinct, the series
    // distinct, and the grid join all consume the downsampled frame.
    val dsm = graft.core.Exec.materialize(
      ds.where(col("value").isNull || !isnan(col("value"))))
    val spine = dsm.select((groupTags :+ "bucket_ms").map(col): _*).distinct()
    val series = dsm.select(seriesCols.map(col): _*).distinct()
    // groupTags empty = global merge: ONE group, its spine is every
    // bucket — an equi join on zero keys would be ill-formed
    val grid =
      if (groupTags.isEmpty) series.crossJoin(spine)
      else series.join(spine, groupTags)
    val joined = grid.join(dsm, seriesCols :+ "bucket_ms", "left")
    val filled = Downsample.fillLinear(joined, seriesCols)
      .withColumn("value", graft.core.D.r4s(col("value")))
    merge(filled, groupTags, aggregator)
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
