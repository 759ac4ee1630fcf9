package graft.tsdb

import graft.core.D
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-series similarity search: Pearson correlation between every
  * pair of series over their ALIGNED downsample buckets ("which series
  * move together" — the TSDB analog of similarity search over streams).
  *
  * Shape: downsample once per series, self-join on the bucket (so the
  * pair blow-up is per-bucket, bounded by series-per-bucket, never a
  * global cross product), then one hash aggregate per pair computing the
  * five sufficient statistics with exact decimal sums — r is derived in
  * DOUBLE at the end and scale-rounded (D3), so the result is identical
  * on any cluster layout and matches the DuckDB oracle formulation.
  */
object Correlate {

  /** Pairwise Pearson r over aligned buckets. `minBuckets` drops pairs
    * with too little overlap; degenerate (constant) series are excluded
    * by the positive-variance predicate. Emits (a_key, b_key, n, r). */
  def pearsonPairs(downsampled: DataFrame, keyCol: String,
                   minBuckets: Int): DataFrame = {
    // materialize the REDUCED (series × bucket) frame once: the
    // self-join would otherwise run the whole upstream scan + downsample
    // aggregate twice, once per side (same pattern as
    // Downsample.withFill; the drivers release the blocks per query)
    val down = graft.core.Exec.materialize(downsampled)
    val a = down.select(col(keyCol).as("a_key"), col("bucket_ms"),
      col("value").as("av"))
    val b = down.select(col(keyCol).as("b_key"), col("bucket_ms"),
      col("value").as("bv"))
    // (18,4)×(18,4) → DECIMAL(37,8): exact in Spark (≤38) AND DuckDB.
    // (19,4) factors would need precision 39 > 38 on the Spark side,
    // silently engaging the precision-loss path (scale-7 rounding) while
    // DuckDB stays exact — a latent cross-engine divergence on near-ties.
    val d18 = DecimalType(18, 4)
    val joined = a.join(b, Seq("bucket_ms")).where(col("a_key") < col("b_key"))
    val stats = joined.groupBy("a_key", "b_key").agg(
      count(lit(1)).as("n"),
      sum(D.dec(col("av"))).cast("double").as("sx"),
      sum(D.dec(col("bv"))).cast("double").as("sy"),
      sum((col("av").cast(d18) * col("bv").cast(d18))).cast("double").as("sxy"),
      sum((col("av").cast(d18) * col("av").cast(d18))).cast("double").as("sxx"),
      sum((col("bv").cast(d18) * col("bv").cast(d18))).cast("double").as("syy"))
    val n = col("n").cast("double")
    val varX = n * col("sxx") - col("sx") * col("sx")
    val varY = n * col("syy") - col("sy") * col("sy")
    stats
      .where(col("n") >= minBuckets && varX > 0 && varY > 0)
      .select(col("a_key"), col("b_key"), col("n"),
        D.r4s((n * col("sxy") - col("sx") * col("sy")) / sqrt(varX * varY)).as("r"))
  }
}
