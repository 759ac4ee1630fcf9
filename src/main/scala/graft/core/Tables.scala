package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table readers (schemas: FIXTURES.md, verified from parquet
  * footers).
  *
  * `events.ts` physical type has varied across fixture generations:
  * TIMESTAMP(NANOS) (rounds 1-8; Spark 4 reads it only as BIGINT nanos
  * under `spark.sql.legacy.parquet.nanosAsLong=true`) and TIMESTAMP(MICROS)
  * (round 9+; Spark reads it as TIMESTAMP_NTZ). [[deriveTs]] branches on
  * the arrived type so every consumer sees the same derived columns
  * (`ts_ms` BIGINT epoch-ms, `ts_sec` BIGINT epoch-s, `ts_ts` TIMESTAMP)
  * regardless of the footer, and nothing downstream touches raw `ts`.
  * Epoch extraction from TIMESTAMP_NTZ goes through a session-timezone
  * cast, so the session MUST pin `spark.sql.session.timeZone=UTC` — the
  * reader enforces it the same way it enforces nanosAsLong (runtime-set,
  * because the driver-owned Verify/Bench sessions are built without it).
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
    s.conf.set("spark.sql.session.timeZone", "UTC")
    deriveTs(table(s, dir, "events"))
  }

  /** The ONE definition of the ts→ms/sec/timestamp derivations, branched
    * on the physical type `ts` arrived as (see the object Scaladoc).
    * Integer division (`DIV`) is mandatory on the nanos path — double
    * division loses precision at 1.7e18 ns (53-bit mantissa). Shared by
    * the batch reader above and the streaming source
    * ([[graft.stream.Ingest.eventsStream]]) so the two paths cannot
    * drift; unused columns are pruned by Catalyst. */
  def deriveTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>  // TIMESTAMP(NANOS) under nanosAsLong
      df.withColumn("ts_ms", expr("CAST(ts DIV 1000000 AS BIGINT)"))
        .withColumn("ts_sec", expr("CAST(ts DIV 1000000000 AS BIGINT)"))
        .withColumn("ts_ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    case _ =>  // TIMESTAMP(MICROS/MILLIS) → TIMESTAMP(_NTZ); tz pinned UTC
      df.withColumn("ts_ts", expr("CAST(ts AS TIMESTAMP)"))
        .withColumn("ts_ms", expr("CAST(unix_micros(ts_ts) DIV 1000 AS BIGINT)"))
        .withColumn("ts_sec", expr("CAST(unix_micros(ts_ts) DIV 1000000 AS BIGINT)"))
  }

  /** Pinned "now" for relative-time queries (D5): just past the events
    * range (FIXTURES.md). 2024-01-31T00:00:00Z. */
  val NowMs: Long = 1706659200000L
  val NowSec: Long = NowMs / 1000L
}
