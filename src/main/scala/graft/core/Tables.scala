package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table readers (schemas: FIXTURES.md, verified from parquet
  * footers).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); Spark 4 refuses to scan it
  * unless `spark.sql.legacy.parquet.nanosAsLong=true` (runtime-settable —
  * required because the driver-owned Verify/Bench sessions are built
  * without it). Under the flag `ts` arrives as BIGINT nanoseconds; we
  * derive `ts_ms` (BIGINT epoch-ms) and `ts_sec` (BIGINT epoch-s) with
  * integer division (`DIV`) — double division would lose precision at
  * 1.7e18 ns (53-bit mantissa).
  */
object Tables {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame   = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = table(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")

  /** events with `ts` = raw BIGINT nanos plus derived columns:
    *  - `ts_ms`  BIGINT epoch milliseconds (exact, integer division)
    *  - `ts_sec` BIGINT epoch seconds
    *  - `ts_ts`  TIMESTAMP at microsecond precision (Spark native)
    * Oracle queries must never emit the raw nanos (DuckDB keeps ns →
    * hash mismatch); emit `ts_ms`/`ts_sec` or a `date_trunc` ≥ second.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    deriveTs(table(s, dir, "events"))
  }

  /** The ONE definition of the ns→ms/sec/timestamp derivations (integer
    * division is mandatory — double division loses precision at 1.7e18
    * ns). Shared by the batch reader above and the streaming source
    * ([[graft.stream.Ingest.eventsStream]]) so the two paths cannot
    * drift; unused columns are pruned by Catalyst. */
  def deriveTs(df: DataFrame): DataFrame =
    df.withColumn("ts_ms", expr("CAST(ts DIV 1000000 AS BIGINT)"))
      .withColumn("ts_sec", expr("CAST(ts DIV 1000000000 AS BIGINT)"))
      .withColumn("ts_ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))

  /** Pinned "now" for relative-time queries (D5): just past the events
    * range (FIXTURES.md). 2024-01-31T00:00:00Z. */
  val NowMs: Long = 1706659200000L
  val NowSec: Long = NowMs / 1000L
}
