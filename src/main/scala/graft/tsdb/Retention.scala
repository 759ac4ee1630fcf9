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

  /** Vacuum: rewrite a parquet table dropping expired rows. `scope`
    * restricts which rows are even read (on a date-partitioned table pass
    * the partition predicate covering the expiring window so only those
    * partitions are scanned and rewritten; unscoped = full-table rewrite). */
  def vacuum(s: SparkSession, path: String, outPath: String,
             tsMsCol: String, nowMs: Long, ttlMs: Long,
             scope: Option[org.apache.spark.sql.Column] = None): Unit = {
    val base = s.read.parquet(path)
    scope.fold(base)(base.where)
      .where(col(tsMsCol) >= nowMs - ttlMs)
      .write.mode("overwrite").parquet(outPath)
  }
}
