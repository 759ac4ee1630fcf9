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
}
