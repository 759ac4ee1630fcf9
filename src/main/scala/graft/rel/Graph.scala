package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a co-purchase graph derived from the star
  * schema: nodes are parts, an edge links two parts that appear in the
  * same order. The classic "items bought together" projection — and the
  * substrate for the two staple whole-graph measures, PageRank and
  * triangle count.
  *
  * Scale shape: edge generation is a self-join CO-PARTITIONED on
  * l_orderkey, so pair blow-up is bounded by (lines per order)² —
  * basket size, a data constant (~7 for TPC-H-like data), never
  * corpus². The edge list is materialized ONCE and reused across
  * PageRank iterations (each iteration is one edge-sized shuffle
  * co-partitioned on the join key, the Pregel/GraphX cost model without
  * the RDD machinery). Per-node contributions are 4dp-decimal-quantized
  * before the order-independent sum, which is what makes an iterative
  * float fixpoint hash-portable across engines.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct undirected co-purchase edges, emitted one row per
    * DIRECTION (symmetric closure) so degree and message-passing are
    * plain groupBys on `src`. */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val e0 = li.alias("a").join(li.alias("b"), "ok")
      .where(col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
      .distinct()
    e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  val queries: Map[String, Q] = Map(
    // Two unrolled PageRank iterations (damping 0.85) from the uniform
    // start, ranks kept RELATIVE to uniform (pr·N) so the 4dp decimal
    // quantization of contributions operates at O(1) magnitude instead
    // of O(1/N) — the same fixed-point-friendly scaling GraphX's
    // normalized variant uses. Every iteration: edges ⋈ deg ⋈ pr on
    // src (co-partitioned), then a groupBy(dst) decimal sum — one
    // edge-sized shuffle per iteration, no broadcast of node state
    // needed. Isolated parts (only ever alone in an order) have no
    // edges and are deliberately absent — rank is defined on the
    // graph, not the catalog.
    "graph_pagerank" -> ((s, dir) => {
      val es = graft.core.Exec.materialize(edges(s, dir))
      val deg = es.groupBy("src").agg(count(lit(1)).as("deg"))
      val step = (prev: Option[DataFrame]) => {
        val msgs = prev match {
          case None => es.join(deg, "src")
            .select(col("dst"), (lit(1.0) / col("deg")).as("m"))
          case Some(pr) => es.join(deg, "src")
            .join(pr.withColumnRenamed("id", "src"), "src")
            .select(col("dst"), (col("pr") / col("deg")).as("m"))
        }
        msgs.groupBy(col("dst").as("id"))
          .agg(graft.core.D.r4s(lit(0.15) +
            lit(0.85) * sum(graft.core.D.dec(col("m"))).cast("double")).as("pr"))
      }
      val p2 = step(Some(graft.core.Exec.materialize(step(None))))
      p2.select(col("id").as("part_id"), col("pr"))
        .orderBy(col("pr").desc, col("part_id"))
        .limit(20)
    }),

    // Whole-graph triangle census plus basic size stats in ONE row.
    // Triangles enumerate over the id-ORIENTED edge list (src < dst),
    // so each triangle is counted exactly once: e(a,b) ⋈ e(b,c) ⋈
    // e(a,c). Cost is Σ out-deg² on the oriented graph; the production
    // hardening for skewed graphs is degree-ordered orientation
    // (orient toward the higher-degree endpoint), which bounds
    // out-degree by √m — same joins, different orientation key.
    "graph_triangles" -> ((s, dir) => {
      val es = graft.core.Exec.materialize(edges(s, dir))
      val e0 = es.where(col("src") < col("dst"))
      val nodes = es.select(col("src")).distinct()
      val wedges = e0.select(col("src").as("a"), col("dst").as("b"))
        .join(e0.select(col("src").as("b"), col("dst").as("c")), "b")
      val tri = wedges
        .join(e0.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
      nodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(e0.agg(count(lit(1)).as("n_edges")))
        .crossJoin(tri)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // mirror: same relative-rank scaling, same per-iteration decimal
    // contribution quantization
    "graph_pagerank" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                      FROM lineitem),
          e0 AS (SELECT DISTINCT a.p AS src, b.p AS dst
                 FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
          edges AS (SELECT src, dst FROM e0
                    UNION ALL SELECT dst, src FROM e0),
          deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
          p1 AS (SELECT e.dst AS id,
                   ${graft.core.D.oR4("0.15 + 0.85 * " +
                     graft.core.D.oSumDec("1.0 / d.deg"))} AS pr
                 FROM edges e JOIN deg d ON e.src = d.src GROUP BY 1),
          p2 AS (SELECT e.dst AS id,
                   ${graft.core.D.oR4("0.15 + 0.85 * " +
                     graft.core.D.oSumDec("p.pr / d.deg"))} AS pr
                 FROM edges e JOIN deg d ON e.src = d.src
                 JOIN p1 p ON p.id = e.src GROUP BY 1)
          SELECT id AS part_id, pr FROM p2
          ORDER BY pr DESC, part_id LIMIT 20""",

    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                     FROM lineitem),
         e0 AS (SELECT DISTINCT a.p AS src, b.p AS dst
                FROM li a JOIN li b ON a.ok = b.ok AND a.p < b.p),
         nodes AS (SELECT DISTINCT src FROM
                     (SELECT src FROM e0 UNION ALL SELECT dst FROM e0)),
         tri AS (SELECT count(*) AS n_triangles
                 FROM e0 ab
                 JOIN e0 bc ON bc.src = ab.dst
                 JOIN e0 ac ON ac.src = ab.src AND ac.dst = bc.dst)
         SELECT (SELECT count(*) FROM nodes) AS n_nodes,
                (SELECT count(*) FROM e0) AS n_edges,
                n_triangles
         FROM tri"""
  )
}
