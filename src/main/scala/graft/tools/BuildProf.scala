package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the scaled-k IVF BUILD (the r14/r15
  * 100×-tier residual): times quantizer training, PQ codebooks, full
  * assignment, and the partitioned lists write separately against a
  * replica dir, so "the build is slow" resolves to a stage. Usage:
  *   tools/run.sh graft.tools.BuildProf /tmp/graft_p100_x100
  */
object BuildProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BuildProf <dirWithEmbeddingsParquet>")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"BUILDPROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    import graft.llm.Similarity
    val p = graft.llm.LlmQueries.scaledAnnParams(spark, dir)
    println(s"params: k=${p.k} stride=${p.trainStride} pqM=${p.pqM} pqK=${p.pqK}")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    t("warm_scan") { emb.count() }
    val trainVecs =
      if (p.trainStride > 1)
        emb.where(pmod(col("vec_id"), lit(p.trainStride.toLong)) === 0L)
      else emb
    var cents: DataFrame = null
    t("lloyd_train") {
      cents = Similarity.ivfCentroids(trainVecs, p.k, p.iters)
      cents.collect()
    }
    t("pq_codebooks") {
      Similarity.pqCodebooks(trainVecs, p.pqM, p.pqK, p.pqIters, p.dim)
        .foreach(_.collect())
    }
    var assigned: DataFrame = null
    t("assign_full") {
      assigned = Similarity.assignToCentroids(emb, cents)
        .withColumn("nrm", Similarity.normExpr("embedding"))
      assigned.count()
    }
    val out = java.nio.file.Files.createTempDirectory("graft_buildprof").toString
    // plain write: pays assignment compute + flat files — separates
    // "assignment recompute" from "dynamic-partition fan-out" cost
    t("write_flat") {
      assigned.write.parquet(s"$out/lists_flat")
    }
    var cached: DataFrame = null
    t("persist_assigned") {
      cached = assigned.persist()
      cached.write.parquet(s"$out/lists_flat2")
    }
    t("write_partitioned_cached") {
      cached.write.partitionBy("centroid_id").parquet(s"$out/lists_cached")
    }
    t("write_partitioned") {
      assigned.write.partitionBy("centroid_id").parquet(s"$out/lists_direct")
    }
    t("write_repartitioned") {
      assigned.repartition(col("centroid_id"))
        .write.partitionBy("centroid_id").parquet(s"$out/lists_repart")
    }
    t("footer_count_direct") {
      spark.read.parquet(s"$out/lists_direct").count()
    }
    t("footer_count_repart") {
      spark.read.parquet(s"$out/lists_repart").count()
    }
    def nfiles(p0: String): Long = {
      val d = java.nio.file.Paths.get(p0)
      scala.util.Using.resource(java.nio.file.Files.walk(d)) { st =>
        st.filter(_.toString.endsWith(".parquet")).count()
      }
    }
    println(s"files direct=${nfiles(s"$out/lists_direct")} " +
      s"repart=${nfiles(s"$out/lists_repart")}")
    spark.stop()
  }
}
