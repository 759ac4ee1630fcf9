package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch sub-stage profiler for llm_sim_ivf (dev-only). */
object IvfProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"IVFPROF $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    import graft.llm.Similarity
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    t("warm_scan") { emb.count() }
    val init = emb.orderBy("vec_id").limit(8)
      .withColumn("centroid_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("vec_id")) - 1).cast("int"))
      .select(col("centroid_id"), col("embedding").as("cvec"))
    t("init_collect") { init.collect() }
    var c = init
    t("lloyd_iter1") { c = Similarity.ivfCentroids(emb, 8, iters = 1); c.collect() }
    t("lloyd_iter1_again") { Similarity.ivfCentroids(emb, 8, iters = 1).collect() }
    t("full_2iters") { Similarity.ivfCentroids(emb, 8, iters = 2).collect() }
    val qv = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    t("topk_after_cents") {
      val cents = Similarity.ivfCentroids(emb, 8, iters = 2)
      Similarity.ivfTopK(emb, qv, cents, 10, nprobe = 2).count()
    }
    t("assign_only") { Similarity.assignToCentroids(emb, c).count() }
    spark.stop()
  }
}
