package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest validation (mycenae collector semantics, SURVEY §1.1): charset
  * rules on metric/tag names+values, required keyset tag, timestamp
  * sanity bounds, numeric value checks; s→ms normalization. Invalid
  * points are rejected with per-point error detail (the engine keeps
  * them in a quarantine frame instead of HTTP 400s).
  */
object Validate {

  /** mycenae/OpenTSDB identifier charset: alnum + `. _ - /`. */
  val CharsetRe = "^[a-zA-Z0-9._/-]+$"

  /** OpenTSDB accepts seconds or milliseconds; normalize to ms
    * (10-digit-era values are seconds). Only POSITIVE seconds-era values
    * are multiplied: a large-negative ts × 1000 would overflow Long and
    * can wrap INTO the valid bounds, turning garbage into a "valid"
    * fabricated timestamp; left unmultiplied it fails the bounds check
    * and quarantines as intended. */
  def normalizeTsMs(ts: Column): Column =
    when(ts > 0L && ts < 10000000000L, ts * 1000).otherwise(ts)

  /** Timestamp sanity: 2000-01-01 .. 2100-01-01 in ms. */
  def tsInBounds(tsMs: Column): Column =
    tsMs >= 946684800000L && tsMs < 4102444800000L

  /** Per-point TTL in ms from the reserved `ttl` tag (retention override
    * in DAYS, SURVEY §1.1 special tags), falling back to the keyset
    * default when the tag is absent. A non-numeric ttl value yields NULL
    * → default; [[validatePoints]] quarantines such points as `bad_ttl`,
    * so the fallback only ever applies to accepted tag-less points. */
  def ttlMsFromTags(tags: Column, defaultTtlMs: Long): Column = {
    val raw = element_at(tags, "ttl")
    // rlike-guarded cast: ANSI mode throws on CAST('7d' AS BIGINT), and
    // the digit bound keeps the cast itself overflow-proof
    coalesce(when(raw.rlike(TtlRe), raw.cast("long") * 86400000L),
      lit(defaultTtlMs))
  }

  /** Valid `ttl` tag value: 1..9999999 days (digit-bounded so the cast
    * can never overflow; leading zeros accepted, bare zero rejected). */
  private val TtlRe = "^0*[1-9][0-9]{0,6}$"

  /** Per-point validation verdicts over a points frame
    * (metric, tags MAP, ts_ms, value). Adds boolean rule columns, an
    * `errors` array of failed-rule names, and `is_valid`. */
  def validatePoints(points: DataFrame, requiredTag: String = "ksid"): DataFrame = {
    // OpenTSDB clients legitimately send seconds — normalize BEFORE the
    // bounds check (nulls stay null and fail ts_ok below)
    val normalized = points.withColumn("ts_ms", normalizeTsMs(col("ts_ms")))
    // coalesce(..., false): a NULL metric/tags/ts makes the raw predicate
    // SQL NULL, which would silently VANISH from the errors array below —
    // null inputs must fail their rule, not pass it
    val metricOk = coalesce(col("metric").rlike(CharsetRe), lit(false))
    val tagsOk = coalesce(expr(
      s"forall(map_keys(tags), k -> k rlike '$CharsetRe') AND " +
      s"forall(map_values(tags), v -> v rlike '$CharsetRe')"), lit(false))
    val ksidOk = coalesce(expr(s"map_contains_key(tags, '$requiredTag')"), lit(false))
    val tsOk = coalesce(tsInBounds(col("ts_ms")), lit(false))
    // finite check: ±Infinity must quarantine too — downstream decimal
    // casts turn Infinity into NULL, silently dropping it from sums
    // while counts still include it
    val valueOk = col("value").isNotNull && !isnan(col("value")) &&
      abs(col("value")) <= lit(Double.MaxValue)
    // reserved `ttl` tag: absent is fine; present must be a positive
    // integer day count (a malformed ttl silently falling back to the
    // keyset default would retain data the client asked to expire).
    // NULL tags pass vacuously — the point already fails tags_ok, and a
    // spurious bad_ttl there would misattribute the quarantine cause
    val ttlOk = when(col("tags").isNull, lit(true)).otherwise(coalesce(
      expr("NOT map_contains_key(tags, 'ttl')") ||
        element_at(col("tags"), "ttl").rlike(TtlRe),
      lit(false)))
    normalized
      .withColumn("metric_ok", metricOk)
      .withColumn("tags_ok", tagsOk)
      .withColumn("ksid_ok", ksidOk)
      .withColumn("ts_ok", tsOk)
      .withColumn("value_ok", valueOk)
      .withColumn("ttl_ok", ttlOk)
      .withColumn("errors", array_compact(array(
        when(!metricOk, "bad_metric"), when(!tagsOk, "bad_tag_charset"),
        when(!ksidOk, s"missing_$requiredTag"), when(!tsOk, "ts_out_of_bounds"),
        when(!valueOk, "bad_value"), when(!ttlOk, "bad_ttl"))))
      .withColumn("is_valid", size(col("errors")) === 0)
  }

  /** Split into (accepted, quarantined) — the 204-vs-400 analog. */
  def partition(validated: DataFrame): (DataFrame, DataFrame) =
    (validated.where(col("is_valid")).drop("metric_ok", "tags_ok", "ksid_ok",
      "ts_ok", "value_ok", "ttl_ok", "errors", "is_valid"),
     validated.where(!col("is_valid")))
}
