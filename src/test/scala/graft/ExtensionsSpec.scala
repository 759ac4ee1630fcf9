package graft

import org.apache.spark.sql.functions._

/** The native expressions are reachable from SQL via registration. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot4 and minhash_sig callable from SQL after register()") {
    org.apache.spark.sql.graftfn.GraftExtensions.register(spark)
    graft.core.Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      "SELECT vec_id, dot4(embedding, embedding) AS d FROM emb_ext ORDER BY vec_id LIMIT 5")
      .as[(Long, Double)].collect().toSeq
    val viaApi = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.llm.Similarity.dotExpr("embedding", "embedding").as("d"))
      .orderBy("vec_id").limit(5).as[(Long, Double)].collect().toSeq
    assert(viaSql == viaApi)
    val sig = spark.sql(
      "SELECT minhash_sig(array('a','b','c','d'), 3, 8) AS s").collect().head
      .getAs[scala.collection.Seq[Long]](0)
    assert(sig.length == 8)
  }

  test("RewriteHofDot rewrites the portable HOF dot into Dot4 in the optimized plan") {
    import org.apache.spark.sql.graftfn.{Dot4, RewriteHofDot}
    org.apache.spark.sql.graftfn.GraftExtensions.register(spark)
    val emb = graft.core.Tables.embeddings(spark, sf)
    def hofDf = emb.select(col("vec_id"),
      graft.llm.Similarity.dotExprHof("embedding", "embedding").as("d"))
    def countDot4(df: org.apache.spark.sql.DataFrame): Int = {
      var n = 0
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
        case _: Dot4 => n += 1
        case _ => ()
      }))
      n
    }
    assert(countDot4(hofDf) > 0, "HOF dot should be rewritten to Dot4")
    // values must be unchanged by the rewrite
    val viaHof = hofDf.orderBy("vec_id").limit(5)
      .as[(Long, Double)].collect().toSeq
    val viaNative = emb.select(col("vec_id"),
      graft.llm.Similarity.dotExpr("embedding", "embedding").as("d"))
      .orderBy("vec_id").limit(5).as[(Long, Double)].collect().toSeq
    assert(viaHof == viaNative)
    // and the conf kill-switch must keep the literal HOF semantics
    spark.conf.set(RewriteHofDot.ConfKey, "false")
    try assert(countDot4(hofDf) == 0, "conf off must leave the HOF form intact")
    finally spark.conf.unset(RewriteHofDot.ConfKey)
  }
}
