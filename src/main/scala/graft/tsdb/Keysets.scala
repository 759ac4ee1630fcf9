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

  // ----------------------- delta-dir lifecycle (grow-without-rebuild)
  //
  // Artifacts that grow with the corpus (ANN inverted lists, dedup band
  // indexes) append batches as `delta_NNNN/` dirs next to the base
  // table `$path/$sub` — each delta its own [[swapBuiltDir]] commit.
  // Readers union base + committed deltas; `compactDeltas` folds them
  // back into the base behind a `_folded` watermark INSIDE the swapped
  // base dir, so the fold is atomic for readers and deleting spent
  // delta dirs is best-effort cleanup, never a correctness event.
  // Concurrency: readers are safe against any single writer at every
  // point (each commit is one atomic rename); appends and compaction
  // are mutually single-writer — the same maintenance-window contract
  // as stream/Ingest.compactPoints.

  private val DeltaRe = "delta_(\\d+)".r

  private[graft] def foldedThru(fs: org.apache.hadoop.fs.FileSystem,
                                path: String, sub: String): Int = {
    val mp = new org.apache.hadoop.fs.Path(s"$path/$sub/_folded")
    if (!fs.exists(mp)) -1
    else {
      val in = fs.open(mp)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        .trim.toInt
      finally in.close()
    }
  }

  /** Committed, un-folded delta dirs under `path`, ascending; any delta
    * caught in the swap crash window is repaired first. */
  private[graft] def deltaDirs(s: SparkSession, path: String,
                               sub: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val folded = foldedThru(fs, path, sub)
    fs.listStatus(p).toIndexedSeq.map(_.getPath.getName).collect {
      case n @ DeltaRe(_) => n
      case t @ _ if t.endsWith(".tmp") && DeltaRe.matches(t.stripSuffix(".tmp")) =>
        t.stripSuffix(".tmp")
    }.distinct
      .filter { case DeltaRe(id) => id.toInt > folded }
      // numeric, not lexical: "delta_10000" sorts before "delta_9999"
      // as a string, which would break the documented ascending order
      .sortBy { case DeltaRe(id) => id.toInt }
      .map { n =>
        repairSwap(s, s"$path/$n")
        s"$path/$n"
      }.filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
  }

  /** Base table ∪ committed deltas — one read per root (a multi-root
    * read trips Spark's common-basePath partition discovery), unioned
    * by name; the base dir's own interrupted swap is repaired first.
    * Missing columns null-fill: tombstone deltas carry only (id, tomb)
    * and live rows never carry `tomb`. */
  private[graft] def readWithDeltas(s: SparkSession, path: String,
                                    sub: String): DataFrame = {
    repairSwap(s, s"$path/$sub")
    (s"$path/$sub" +: deltaDirs(s, path, sub).map(d => s"$d/$sub"))
      .map(r => s.read.parquet(r))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Apply tombstone deltas to a [[readWithDeltas]] union: a row with
    * `tomb = true` shadows EVERY row of its id (ids are never reused —
    * the LSM/Lucene deferred-delete contract), and the marker rows
    * themselves vanish. Tombstone sets are usually takedown-sized, so
    * the anti-join broadcasts — but GATED on a bounded count (a bulk
    * GDPR-scale delete between compactions must degrade to a shuffle
    * anti-join, not hit the broadcast limit and fail every probe until
    * compaction). A frame with no `tomb` column (never-deleted index,
    * or freshly compacted base) passes through untouched. */
  private[graft] def dropTombstoned(df: DataFrame, idCol: String,
                                    maxBroadcastRows: Long = 4000000L): DataFrame =
    if (!df.columns.contains("tomb")) df
    else {
      val tombs = df.where(col("tomb")).select(idCol)
      val probe = math.min(maxBroadcastRows + 1, Int.MaxValue.toLong).toInt
      val tombSide =
        if (tombs.limit(probe).count() <= maxBroadcastRows) broadcast(tombs)
        else tombs.hint("shuffle_hash")
      df.where(col("tomb").isNull)
        .join(tombSide, Seq(idCol), "left_anti")
        .drop("tomb")
    }

  /** The numeric id of a delta dir, parsed from its BASENAME — parsing
    * the full path would misread an artifact that happens to live
    * under a `delta_N`-named parent directory. */
  private def deltaId(dir: String): Int = {
    val name = new org.apache.hadoop.fs.Path(dir).getName
    DeltaRe.findFirstMatchIn(name).get.group(1).toInt
  }

  /** Land one batch as the next delta (id clears BOTH visible deltas
    * and the folded watermark — a reused folded id would be invisible
    * to readers). `write` stages the batch under `$tmp/$sub`. */
  private[graft] def appendDelta(s: SparkSession, path: String, sub: String)
                                (write: String => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val next = (deltaDirs(s, path, sub).map(deltaId(_) + 1)
      :+ (foldedThru(fs, path, sub) + 1) :+ 0).max
    swapBuiltDir(s, f"$path/delta_$next%04d") { tmp =>
      write(s"$tmp/$sub")
    }
  }

  // Streaming-sink replay idempotence — the Delta Lake txnAppId /
  // txnVersion pattern, NOT id-reuse: every delta auto-allocates the
  // next id (so stream batches, takedown tombstones, and manual
  // appends NEVER collide on a delta dir), and each stream records the
  // highest batch it committed in `_txn` files ("streamId=batchId"
  // lines) that travel with the commits — inside each delta dir, and
  // merged into the base table's `_txn` by compaction so the record
  // survives folding. A replayed micro-batch compares its id against
  // the committed watermark and lands nothing.

  private def parseTxn(fs: org.apache.hadoop.fs.FileSystem,
                       dir: String): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_txn")
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      txt.linesIterator.filter(_.contains("=")).map { l =>
        val i = l.lastIndexOf('=')
        l.substring(0, i) -> l.substring(i + 1).trim.toLong
      }.toMap
    }
  }

  private def writeTxn(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                       txn: Map[String, Long]): Unit = {
    if (txn.isEmpty) return
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_txn"), true)
    try out.write(txn.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Highest batch id `streamId` has committed to this artifact:
    * max over the base table's merged `_txn` and every visible
    * delta's `_txn`; -1 when the stream has never written. */
  private[graft] def committedBatch(s: SparkSession, path: String, sub: String,
                                    streamId: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    repairSwap(s, s"$path/$sub")
    val dirs = s"$path/$sub" +: deltaDirs(s, path, sub)
    dirs.flatMap(d => parseTxn(fs, d).get(streamId)).foldLeft(-1L)(math.max)
  }

  /** Land one micro-batch exactly once: skipped (returns false) when
    * `streamId` already committed `batchId` — whether the original
    * delta is still visible or long since folded into the base. The
    * delta id itself auto-allocates, so concurrent-regime writers
    * (takedowns, manual appends) can never be overwritten by a
    * replayed stream batch. */
  private[graft] def appendDeltaTxn(s: SparkSession, path: String, sub: String,
                                    streamId: String, batchId: Long)
                                   (write: String => Unit): Boolean = {
    if (committedBatch(s, path, sub, streamId) >= batchId) return false
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    appendDelta(s, path, sub) { tmp =>
      write(tmp)
      // tmp is "$delta.tmp/$sub"-shaped only for the payload; the txn
      // marker sits at the delta ROOT so readers of any sub see it
      writeTxn(fs, new org.apache.hadoop.fs.Path(tmp).getParent.toString,
        Map(streamId -> batchId))
    }
    true
  }

  /** Fold committed deltas into the base table: `rewrite` stages the
    * merged frame at the given tmp path; the watermark AND the merged
    * per-stream txn records travel inside the swapped base dir, so
    * both survive the fold and spent delta dirs are deleted
    * best-effort. */
  private[graft] def compactDeltas(s: SparkSession, path: String, sub: String)
                                  (rewrite: (DataFrame, String) => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val deltas = deltaDirs(s, path, sub)
    if (deltas.isEmpty) return
    val maxId = deltas.map(deltaId).max
    val txn = (s"$path/$sub" +: deltas)
      .map(d => parseTxn(fs, d))
      .foldLeft(Map.empty[String, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, math.max(v, a.getOrElse(k, -1L))) }
      }
    val merged = readWithDeltas(s, path, sub)
    swapBuiltDir(s, s"$path/$sub") { tmp =>
      rewrite(merged, tmp)
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$tmp/_folded"), true)
      try out.write(maxId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      writeTxn(fs, tmp, txn)
    }
    deltas.foreach { d =>
      val dp = new org.apache.hadoop.fs.Path(d)
      if (fs.exists(dp)) { fs.delete(dp, true); () }
    }
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
