package graft.tsdb

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Rollup exactness: re-aggregating 1m partial state to 1h must equal
  * downsampling the raw points at 1h, for every re-aggregable
  * aggregator — including avg (sum/count, never avg-of-avgs). */
class RollupSpec extends SparkSpec {

  private def ev = Tables.events(spark, sf)
    .select(col("event_type"), col("user_id"), col("ts_ms"), col("value"))

  private def collectSorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_type", "user_id", "bucket_ms")
      .collect().map(_.toString).toSeq

  test("1m rollup re-aggregates exactly to 1h for sum/count/min/max/avg") {
    val keys = Seq("event_type", "user_id")
    val rollup = Rollups.build(ev, keys, 60000L)
    for (agg <- Seq("sum", "count", "min", "max", "avg")) {
      val fromRollup = Rollups.reaggregate(rollup, keys, 3600000L, agg)
      val direct = Downsample(ev, keys, 3600000L, agg)
      assert(collectSorted(fromRollup) == collectSorted(direct),
        s"rollup mismatch for $agg")
    }
  }

  test("router: rollup answers compatible queries, raw covers the rest") {
    val keys = Seq("event_type", "user_id")
    val path = java.nio.file.Files.createTempDirectory("graft_ru_").toString + "/r1m"
    Rollups.write(Rollups.build(ev, keys, 60000L), path)
    // compatible: 1h avg via the 1m rollup
    val viaRollup = Rollups.downsampleVia(spark, ev, Some(path), 60000L,
      keys, DownsampleSpec(3600000L, "avg"))
    val direct = Downsample(ev, keys, 3600000L, "avg")
    assert(collectSorted(viaRollup) == collectSorted(direct))
    // day partitioning prunes rollup scans by time range
    val plan = spark.read.parquet(path).where(col("day") === 1704067200000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), s"no pruning:\n$plan")
    // incompatible interval (90s is not a multiple of 60s → 90s IS; use 90001)
    assert(!Rollups.compatible(60000L, 90001L, "sum"))
    // non-reaggregable aggregator falls back to raw
    assert(!Rollups.compatible(60000L, 3600000L, "last"))
    val viaRaw = Rollups.downsampleVia(spark, ev, Some(path), 60000L,
      keys, DownsampleSpec(3600000L, "last"))
    assert(collectSorted(viaRaw) ==
      collectSorted(Downsample(ev, keys, 3600000L, "last")))
  }
}
