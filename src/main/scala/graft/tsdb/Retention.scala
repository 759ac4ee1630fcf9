package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TTL retention (Cassandra-TTL analog, SURVEY §2.J `tsdb_ttl_expiry`).
  * Read path: a retention predicate applied at scan (pushed to parquet
  * row-group stats / partition pruning when the table is partitioned by
  * date). Write path: a vacuum job that rewrites only partitions
  * containing expired rows.
  */
object Retention {

  /** Scan-side TTL: keep rows with tsMs >= now - ttl. */
  def applyTtl(points: DataFrame, tsMsCol: String, nowMs: Long, ttlMs: Long): DataFrame =
    points.where(col(tsMsCol) >= nowMs - ttlMs)

  /** Scan-side TTL honoring the per-point `ttl` tag (SURVEY §1.1 special
    * tags): a point carrying a ttl tag expires by its OWN retention; the
    * keyset default applies only to tag-less points. Still a single scan
    * predicate — per-point ttl costs one map-side coalesce, no extra
    * pass, so it prunes row groups exactly like the fixed-ttl form. */
  def applyTtlWithOverride(points: DataFrame, tsMsCol: String, tagsCol: String,
                           nowMs: Long, defaultTtlMs: Long): DataFrame =
    points.where(col(tsMsCol) >=
      lit(nowMs) - graft.stream.Validate.ttlMsFromTags(col(tagsCol), defaultTtlMs))

  /** Vacuum: rewrite dropping expired rows. `outPath` receives ONLY the
    * surviving rows that match `scope` — with a scope the output is a
    * REPLACEMENT FOR THOSE PARTITIONS ONLY, not the whole table; the
    * caller owns swapping it in for the scoped partition directories
    * (out-of-scope data is neither read nor written). Unscoped =
    * full-table rewrite to `outPath`. `outPath` must differ from `path`:
    * overwriting a parquet path while reading it corrupts the source. */
  def vacuum(s: SparkSession, path: String, outPath: String,
             tsMsCol: String, nowMs: Long, ttlMs: Long,
             scope: Option[org.apache.spark.sql.Column] = None): Unit = {
    require(new org.apache.hadoop.fs.Path(path) !=
      new org.apache.hadoop.fs.Path(outPath),
      s"vacuum cannot overwrite its own input path in place: $path")
    val base = s.read.parquet(path)
    scope.fold(base)(base.where)
      .where(col(tsMsCol) >= nowMs - ttlMs)
      .write.mode("overwrite").parquet(outPath)
  }
}
