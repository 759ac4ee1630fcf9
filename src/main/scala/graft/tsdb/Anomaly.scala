package graft.tsdb

import graft.core.D
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trailing-window anomaly detection over downsampled series: each
  * bucket's value is z-scored against the series' previous `lookback`
  * buckets (exclusive of the current one — the candidate must not
  * contaminate its own baseline).
  *
  * Shape: ONE window pass per series computing exact decimal sufficient
  * statistics (n, Σx, Σx²) — no self-join, no second scan; mean/variance
  * derive in DOUBLE at the end (same D3 discipline as
  * [[Correlate.pearsonPairs]]), so results are identical under any
  * partitioning and match the DuckDB oracle formulation. At 100 TB the
  * input is the already-reduced (series × bucket) frame and the only
  * shuffle is the window's hash partition on the series key.
  */
object Anomaly {

  /** Flag buckets whose |z| ≥ `threshold` against the trailing baseline.
    * `minBuckets` suppresses verdicts on a thin baseline; constant
    * (zero-variance) baselines are excluded by the positive-variance
    * predicate. Emits (series…, bucket_ms, value, z). */
  def zscore(downsampled: DataFrame, seriesCols: Seq[String],
             lookback: Int, minBuckets: Int, threshold: Double): DataFrame = {
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy("bucket_ms")
      .rowsBetween(-lookback, -1)
    val d18 = DecimalType(18, 4)
    val stats = downsampled
      .withColumn("bn", count(col("value")).over(w))
      .withColumn("sx", sum(D.dec(col("value"))).over(w).cast("double"))
      .withColumn("sxx",
        sum(col("value").cast(d18) * col("value").cast(d18)).over(w).cast("double"))
    val n = col("bn").cast("double")
    // sample variance from sufficient stats: (nΣx² - (Σx)²) / (n(n-1))
    val varNum = n * col("sxx") - col("sx") * col("sx")
    val z = (col("value") - col("sx") / n) /
      sqrt(varNum / (n * (n - lit(1.0))))
    stats
      .where(col("bn") >= minBuckets && varNum > 0 && abs(z) >= threshold)
      .select(seriesCols.map(col) ++
        Seq(col("bucket_ms"), col("value"), D.r4s(z).as("z")): _*)
  }
}
