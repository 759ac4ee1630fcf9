package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Series-metadata catalog — the Elasticsearch-index analog (SURVEY §1.2).
  * A compacted table {tsid, metric, tags} queried for suggest/lookup and
  * used as a semi-join prune before the points scan. Built batch here;
  * [[graft.stream.Ingest]] maintains it incrementally via foreachBatch.
  */
object Catalog {

  /** THE canonical tag serialization (sorted k=v join). tsid consistency
    * across catalog build / prune / pipeline depends on every caller
    * using this one definition. */
  def canonicalTags: org.apache.spark.sql.Column = expr(
    "array_join(transform(array_sort(map_keys(tags)), k -> concat(k, '=', element_at(tags, k))), ',')")

  /** Distinct series of a canonical points frame (metric, tags map). The
    * tsid is a hash of metric + canonically-sorted tag serialization —
    * xxhash64, Spark's native 64-bit hash (codegen'd). */
  def fromPoints(points: DataFrame): DataFrame = {
    // distinct on the canonical STRING (set ops are unsupported on MAP
    // columns); the map is rebuilt from it afterwards.
    points.select(col("metric"), canonicalTags.as("tags_canonical"))
      .distinct()
      // str_to_map('') yields {'' -> null}, not an empty map — guard the
      // untagged-series case so it round-trips as map() instead of a
      // corrupt single-entry map
      .withColumn("tags", expr(
        "CASE WHEN tags_canonical = '' THEN map() " +
          "ELSE str_to_map(tags_canonical, ',', '=') END"))
      .withColumn("tsid", xxhash64(col("metric"), col("tags_canonical")))
  }

  /** `/api/suggest` analog: prefix match over one catalog column,
    * deduped, sorted, capped. */
  def suggest(catalog: DataFrame, column: String, prefix: String, max: Int): DataFrame =
    catalog.where(col(column).startsWith(prefix))
      .select(col(column)).distinct().orderBy(col(column)).limit(max)

  /** `/api/search/lookup` analog: series matching metric + tag filters,
    * stable order, offset/limit pagination. */
  def lookup(catalog: DataFrame, metric: String, filters: Seq[TagFilterSpec],
             limit: Int, offset: Int = 0): DataFrame = {
    var df = catalog.where(col("metric") === metric)
    filters.foreach { f => df = df.where(TagFilters.toMapPredicate(col("tags"), f)) }
    df.orderBy(col("metric"), col("tags_canonical")).offset(offset).limit(limit)
  }

  /** Prune a points frame to series matching the catalog subset — the
    * ES-before-Cassandra two-phase read (SURVEY §4.1 row 1). Broadcast
    * left-semi join on (metric, canonical tags): exact — unlike a join
    * on the 64-bit tsid hash, a collision can't leak a foreign series.
    * (Canonical serialization is unambiguous because the ingest charset
    * [[graft.stream.Validate.CharsetRe]] forbids ',' and '=' in tag
    * keys/values.) */
  def pruneByCatalog(points: DataFrame, matchingSeries: DataFrame): DataFrame = {
    points.withColumn("tags_canonical", canonicalTags)
      .join(broadcast(matchingSeries.select("metric", "tags_canonical")),
        Seq("metric", "tags_canonical"), "left_semi")
      .drop("tags_canonical")
  }
}
