package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{D, Tables}

/** Dev-only stage profiler for llm_embed_pca (not part of the driver
  * contract): times the gram build vs the power-iteration tail so the
  * r18 optimization targets the real cost. Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.PcaProf
  */
object PcaProf {
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
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    for (round <- 1 to 2) {
      val half = Tables.embeddings(spark, sfDir)
        .select(posexplode(col("embedding")).as(Seq("i", "xi")), col("embedding"))
        .select(col("i"), col("xi"),
          posexplode(expr("slice(embedding, i + 1, size(embedding))"))
            .as(Seq("dj", "xj")))
        .select(col("i").cast("long").as("i"),
          (col("i") + col("dj")).cast("long").as("j"),
          col("xi").cast("double").as("xi"), col("xj").cast("double").as("xj"))
      t(s"r$round gram_expand_count") { half.count() }
      var gramHalf: org.apache.spark.sql.DataFrame = null
      t(s"r$round gram_agg_materialize") {
        gramHalf = graft.core.Exec.materialize(
          half.groupBy(col("i"), col("j"))
            .agg(sum(D.dec(col("xi") * col("xj"))).cast("double").as("g")))
        gramHalf.count()
      }
      val gram = gramHalf.unionByName(gramHalf.where(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("g")))
      val v1 = gram.groupBy(col("i"))
        .agg(D.r4s(sum(D.dec(col("g") * lit(0.125))).cast("double")).as("v"))
      val n1 = v1.agg(
        sqrt(sum(D.dec10(col("v") * col("v"))).cast("double")).as("n1"))
      val v1n = v1.crossJoin(broadcast(n1))
        .select(col("i"), D.r4s(col("v") / col("n1")).as("v"))
      val v2 = gram.join(v1n.select(col("i").as("j"), col("v")), "j")
        .groupBy(col("i"))
        .agg(D.r4s(sum(D.dec(col("g") * col("v"))).cast("double")).as("v"))
      val nrm = v2.agg(
        sqrt(sum(D.dec10(col("v") * col("v"))).cast("double")).as("n"))
      val fin = v2.crossJoin(broadcast(nrm))
        .select(col("i").as("pos"), D.r4s(col("v") / col("n")).as("loading"))
        .orderBy("pos")
      t(s"r$round power_iter_tail") { fin.count() }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
