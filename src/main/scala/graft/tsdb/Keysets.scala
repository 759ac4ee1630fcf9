package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyset / keyspace management (SURVEY §1.1 multi-tenancy): keysets are
  * metadata namespaces, keyspaces carry retention config. Here both are
  * one registry table (parquet) keyed by ksid with `{ttl_ms,
  * replication, created_ms}`; tenant isolation at the data layer is the
  * `ksid` partition column (partition pruning = tenant routing).
  */
object Keysets {
  private val Schema = "ksid STRING, ttl_ms BIGINT, replication INT, created_ms BIGINT"

  def create(s: SparkSession, registryPath: String, ksid: String,
             ttlMs: Long, replication: Int, nowMs: Long): Unit = {
    require(ksid.matches(graft.stream.Validate.CharsetRe), s"invalid ksid: $ksid")
    val row = s.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(ksid, ttlMs, replication, nowMs)),
      org.apache.spark.sql.types.StructType.fromDDL(Schema))
    // bootstrap ONLY when the registry doesn't exist yet; any other read
    // failure must propagate (an empty substitute would wipe the registry)
    repairSwap(s, registryPath)
    val p = new org.apache.hadoop.fs.Path(registryPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(p))
        s.read.parquet(registryPath).where(col("ksid") =!= ksid).unionByName(row)
      else row
    swapInto(s, merged, registryPath)
  }

  /** Write-then-rename swap: the crash window is the metadata rename, not
    * a data rewrite. Hadoop FileSystem signals failure via RETURN VALUE,
    * not exceptions — ignoring it would leave the destination deleted
    * with no error. (A transactional table format is the real-cluster
    * answer; these state tables are small and single-writer by contract.) */
  private[graft] def swapInto(s: SparkSession, df: DataFrame, dest: String): Unit = {
    val destP = new org.apache.hadoop.fs.Path(dest)
    val tmpP = new org.apache.hadoop.fs.Path(dest + ".tmp")
    val fs = destP.getFileSystem(s.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(tmpP.toString)
    // The `_SUCCESS` marker is repairSwap's commit signal. Write it
    // ourselves instead of relying on the committer's, so recovery does
    // not silently break when a session runs with
    // mapreduce.fileoutputcommitter.marksuccessfuljobs=false. Ordering
    // keeps the window safe: a crash before this line leaves the
    // destination untouched (delete happens below), so an unmarked .tmp
    // never holds the only copy of the state.
    fs.create(new org.apache.hadoop.fs.Path(tmpP, "_SUCCESS"), true).close()
    if (fs.exists(destP) && !fs.delete(destP, true))
      throw new java.io.IOException(s"could not delete $destP for swap")
    if (!fs.rename(tmpP, destP))
      throw new java.io.IOException(s"rename $tmpP -> $destP failed; " +
        s"previous state preserved at $tmpP")
    ()
  }

  /** Finish an interrupted swap before touching a swapInto-managed table.
    * swapInto fully writes (and commits — Spark leaves a `_SUCCESS`
    * marker) the `.tmp` BEFORE deleting the destination, so a missing
    * destination with a COMMITTED `.tmp` means the crash hit the
    * delete→rename window and the `.tmp` holds the current state:
    * complete the rename. A `.tmp` WITHOUT the marker is a crashed
    * in-progress write — no state was ever lost — and is ignored (the
    * next swap's overwrite replaces it). Repairing eagerly (instead of
    * reading from `.tmp` in place) also keeps writers safe: a
    * read-from-.tmp feeding swapInto would overwrite its own input. */
  private[graft] def repairSwap(s: SparkSession, dest: String): Unit = {
    val destP = new org.apache.hadoop.fs.Path(dest)
    val fs = destP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(destP)) {
      val tmpP = new org.apache.hadoop.fs.Path(dest + ".tmp")
      if (fs.exists(new org.apache.hadoop.fs.Path(tmpP, "_SUCCESS")) &&
          !fs.rename(tmpP, destP))
        throw new java.io.IOException(
          s"recovery rename $tmpP -> $destP failed; state preserved at $tmpP")
    }
  }

  /** [[swapInto]] generalized to a MULTI-TABLE artifact directory (e.g.
    * the ANN index: centroids + codebooks + inverted lists + meta):
    * `build` populates the `.tmp` dir with whatever tables/files the
    * artifact needs, then the same marker-before-delete rename contract
    * applies — so [[repairSwap]] recovers these artifacts unchanged. */
  private[graft] def swapBuiltDir(s: SparkSession, dest: String)
                                 (build: String => Unit): Unit = {
    val destP = new org.apache.hadoop.fs.Path(dest)
    val tmpP = new org.apache.hadoop.fs.Path(dest + ".tmp")
    val fs = destP.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(tmpP) && !fs.delete(tmpP, true))
      throw new java.io.IOException(s"could not clear stale $tmpP")
    build(tmpP.toString)
    fs.create(new org.apache.hadoop.fs.Path(tmpP, "_SUCCESS"), true).close()
    if (fs.exists(destP) && !fs.delete(destP, true))
      throw new java.io.IOException(s"could not delete $destP for swap")
    if (!fs.rename(tmpP, destP))
      throw new java.io.IOException(s"rename $tmpP -> $destP failed; " +
        s"previous state preserved at $tmpP")
    ()
  }

  def list(s: SparkSession, registryPath: String): DataFrame = {
    repairSwap(s, registryPath)
    s.read.parquet(registryPath).orderBy("ksid")
  }

  def drop(s: SparkSession, registryPath: String, ksid: String): Unit = {
    repairSwap(s, registryPath)
    // no driver-side collect needed: swapInto fully writes to a .tmp
    // path BEFORE deleting the destination, so the lazy read is
    // materialized while its source still exists (same pattern as
    // create())
    swapInto(s, s.read.parquet(registryPath).where(col("ksid") =!= ksid),
      registryPath)
  }

  /** Apply a tenant's retention to its slice of a points table
    * (partition-pruned scan by ksid + TTL predicate). */
  def scanTenant(points: DataFrame, registry: DataFrame, ksid: String,
                 nowMs: Long): DataFrame = {
    val ttl = registry.where(col("ksid") === ksid)
      .select("ttl_ms").collect().headOption
      .map(_.getLong(0)).getOrElse(Long.MaxValue)
    points.where(col("ksid") === ksid)
      .where(col("ts_ms") >= lit(nowMs - ttl))
  }
}
