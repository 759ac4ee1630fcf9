package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Dedup, LlmQueries, Similarity}

/** Dev-only stage profiler for llm_semdedup (r18): splits the row's
  * time into index read, pair cosines, label propagation and the tail
  * so optimization targets the real cost. Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.SemProf
  */
object SemProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    val emb = Tables.embeddings(spark, sfDir)
    emb.count()
    LlmQueries.prebuildArtifacts(spark, sfDir)

    for (round <- 1 to 2) {
      val path = LlmQueries.annIndexPath(sfDir)
      var assigned: org.apache.spark.sql.DataFrame = null
      t(s"r$round read_lists") {
        assigned = Similarity.readLists(spark, path)
          .select("vec_id", "embedding", "nrm", "centroid_id")
        assigned.count()
      }
      var pairs: org.apache.spark.sql.DataFrame = null
      t(s"r$round pair_cosines_mat") {
        pairs = graft.core.Exec.materialize(
          Similarity.blockedPairCosines(assigned, "centroid_id", ordered = true)
            .where(col("sim") >= 0.35))
        pairs.count()
      }
      t(s"r$round pair_cosines_unfiltered") {
        Similarity.blockedPairCosines(assigned, "centroid_id", ordered = true).count()
      }
      var labels: org.apache.spark.sql.DataFrame = null
      t(s"r$round cluster_labels") {
        labels = Dedup.clusterLabels(pairs)
        labels.count()
      }
      t(s"r$round tail") {
        val maxSim = pairs.select(col("a_id").as("node"), col("sim"))
          .union(pairs.select(col("b_id").as("node"), col("sim")))
          .groupBy("node").agg(max(col("sim")).as("max_sim"))
        labels.where(col("node") =!= col("label"))
          .join(maxSim, "node")
          .select(col("node").as("drop_id"), col("label").as("kept_id"),
            col("max_sim"))
          .orderBy("drop_id").count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
