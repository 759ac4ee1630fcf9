package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Shared execution helpers for the driver-facing mains (Bench, Verify,
  * Prof, ScaleProbe) plus the ONE materialization primitive every eager
  * mid-plan cut in the main tree goes through. */
object Exec {

  /** Reliable-materialization switch: `SPARK_GRAFT_RELIABLE=1` (env) or
    * `-Dgraft.reliable=1` (tests toggle the prop per-suite; env vars
    * can't be set per-JVM under a forked sbt test run). */
  private def reliableMode: Boolean =
    sys.props.get("graft.reliable").orElse(sys.env.get("SPARK_GRAFT_RELIABLE"))
      .contains("1")

  /** Cut a plan and materialize it eagerly — THE materializer for every
    * shared-scan slice, self-join input, and fixpoint-loop round in the
    * main tree (one definition, switchable at once).
    *
    * Default: `localCheckpoint(eager)` — cheapest on local[n], but the
    * truncated lineage lives in UNREPLICATED executor block storage, so
    * on a real cluster an executor loss makes the frame unrecomputable
    * mid-query. With [[reliableMode]] on, the cut is a RELIABLE
    * checkpoint instead: blocks land under the checkpoint dir (HDFS/
    * object store on a cluster), surviving executor loss — the setting a
    * 100 TB deployment runs with. Both variants truncate lineage, which
    * the label-propagation loops depend on (a lineage-keeping persist
    * would stack O(rounds) of join plans). Reliable-mode checkpoint
    * files are reclaimed by the ContextCleaner only under
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (set it at
    * session build on a long-lived cluster deployment; one-shot jobs
    * can simply clear the checkpoint dir on exit). */
  def materialize(df: DataFrame): DataFrame =
    if (reliableMode) {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        // falling back to the DRIVER-LOCAL tmpdir keeps local[n] runs
        // and tests working, but on a multi-node cluster a non-shared
        // checkpoint dir defeats the executor-loss durability reliable
        // mode exists for — warn loudly (once) so a deployment that
        // forgot sc.setCheckpointDir(<HDFS/object-store path>) sees it
        val fallback = java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_ckpt"))
          .toString
        if (!warnedLocalCkpt.getAndSet(true))
          System.err.println(
            s"[graft] WARNING: reliable mode is on but no checkpoint dir " +
              s"is configured; falling back to driver-local $fallback. On a " +
              "multi-node cluster set SparkContext.setCheckpointDir to a " +
              "SHARED path or checkpoints will NOT survive executor loss.")
        sc.setCheckpointDir(fallback)
      }
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)

  private val warnedLocalCkpt = new java.util.concurrent.atomic.AtomicBoolean(false)

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
