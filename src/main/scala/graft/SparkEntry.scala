package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered per module (tsdb / rel / llm / stream); this
  * object only aggregates them. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * = tsdb_query_pipeline: filter → 1h-avg downsample per series →
    * merge-sum by event_type → total order. */
  def entry(spark: SparkSession): DataFrame =
    tsdb.Pipeline.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Both unions
    * REFUSE key collisions (Reg) — a query re-registered in two modules,
    * or twice inside one module's Map literal, fails the first run
    * loudly instead of silently shadowing. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    core.Reg.disjointUnion(tsdb.TsdbQueries.queries, rel.Relational.queries,
      llm.LlmQueries.queries, stream.StreamQueries.queries)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    core.Reg.disjointUnion(tsdb.TsdbQueries.oracleSql, rel.Relational.oracleSql,
      llm.LlmQueries.oracleSql, stream.StreamQueries.oracleSql)
}
