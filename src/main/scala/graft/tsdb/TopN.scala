package graft.tsdb

import graft.core.D
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OpenTSDB-style top-N series selection: rank each group's series by an
  * aggregate of their downsampled values and keep the N best — "top 5
  * users by average click value", the classic dashboard ask the plain
  * merge/downsample surface can't express.
  *
  * 100 TB cost shape: the only point-sized shuffle is the upstream
  * downsample (partial-aggregated map-side); scoring folds buckets to
  * ONE ROW PER SERIES with another partial agg, and the ranking window
  * runs over series-cardinality rows partitioned by group — never over
  * points. Ties break on the series key (D1: the emitted rank is a
  * total order, identical cross-engine).
  */
object TopN {

  /** Rank `down`'s series (identified by `seriesCols`) within each
    * `groupCols` group by `scoreAgg` of their bucket values; keep the
    * top `n`. Output: groupCols ++ seriesCols ++ (score, rnk). */
  def apply(down: DataFrame, groupCols: Seq[String], seriesCols: Seq[String],
            n: Int, scoreAgg: String = "avg"): DataFrame = {
    val score = scoreAgg match {
      case "avg" => D.avgDec(col("value"))
      case "sum" => D.sumDec(col("value"))
      case "max" => max(col("value"))
      case "min" => min(col("value"))
      // OpenTSDB highestCurrent: rank by the series' most recent
      // bucket value (bucket_ms is unique per series post-downsample,
      // so max_by is deterministic and partial-agg mergeable)
      case "last" => max_by(col("value"), col("bucket_ms"))
      case other => throw new IllegalArgumentException(
        s"unknown topn score aggregator '$other'")
    }
    val scored = down.groupBy((groupCols ++ seriesCols).map(col): _*)
      .agg(score.as("score"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("score").desc +: seriesCols.map(col): _*)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= n)
  }
}
