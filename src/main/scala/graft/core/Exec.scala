package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Shared execution helpers for the driver-facing mains (Bench, Verify,
  * Prof, ScaleProbe). */
object Exec {

  /** Force FULL-ROW evaluation of a query result. A bare `count()` lets
    * Catalyst prune every column — the projection being benchmarked is
    * never computed, so map-only queries (string functions, PII scrub,
    * multimodal metadata…) time as a scan count (VERDICT r3 §wrong-2).
    * Running the plan's own RDD materializes every output column into
    * UnsafeRows — the exact work a consumer (write/collect) would pay,
    * with no extra hashing added to the measurement. */
  def forceRows(df: DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** Run `body`, then release ONLY the persistent-RDD blocks it created
    * (set-diff of ids before/after). Eager localCheckpoints inside query
    * plans (Downsample.withFill, Dedup.nearDupPairs*) pin executor
    * storage; across a 130-query session they accumulate until GC. A
    * blanket `getPersistentRDDs.foreach(unpersist)` sweep is wrong in the
    * other direction: it would irreversibly drop locally-checkpointed
    * blocks held by frames cached ACROSS queries (lineage is truncated,
    * so they cannot recompute — ADVICE r3). */
  def releasingNewBlocks[T](sc: SparkContext)(body: => T): T = {
    val before = sc.getPersistentRDDs.keySet
    try body
    finally sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(false)
    }
  }
}
