package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregates the relational operator surface (SURVEY §2.A–H). */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = graft.core.Reg.disjointUnion(
    ScanFilter.queries, Joins.queries, Aggs.queries,
    Windows.queries, SetsFns.queries, Behavior.queries, Graph.queries)

  val oracleSql: Map[String, String] = graft.core.Reg.disjointUnion(
    ScanFilter.oracleSql, Joins.oracleSql, Aggs.oracleSql,
    Windows.oracleSql, SetsFns.oracleSql, Behavior.oracleSql,
    Graph.oracleSql)
}
