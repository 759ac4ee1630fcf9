package graft.tools
import org.apache.spark.sql.SparkSession
object BuildOnce {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("graft_buildonce").toString
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.llm.LlmQueries.scaledAnnParams(spark, dir)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.llm.Similarity.buildIvfIndex(spark, emb, s"$out/idx", s"bo$i", p)
      println(f"BUILDONCE run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s (k=${p.k})")
    }
    spark.stop()
  }
}
