package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: stored-index probe recall vs a fresh rebuild as
  * a function of appended (quantizer-untrained) mass — the evidence
  * behind [[graft.llm.Similarity.RetrainThreshold]]. For each train
  * fraction the index is built on a corpus slice, the rest appended
  * with the stored quantizer (zero retraining), and the drifted probe's
  * top-k compared to a whole-corpus rebuild's. Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 tools/run.sh graft.tools.DriftCurve`
  * — results recorded in PERF.md (r8). */
object DriftCurve {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = graft.core.Tables.embeddings(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft_driftcurve")
    val qs = emb.where(col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val freshPath = root.resolve("fresh").toString
    graft.llm.Similarity.buildIvfIndex(spark, emb, freshPath, "fresh")
    println("train_pct,delta_fraction,recall_at_5")
    Seq(95, 90, 80, 70, 50).foreach { pct =>
      val path = root.resolve(s"t$pct").toString
      graft.llm.Similarity.buildIvfIndex(spark,
        emb.where(pmod(col("vec_id"), lit(100)) < pct), path, s"t$pct")
      graft.llm.Similarity.appendIvfDelta(spark,
        emb.where(pmod(col("vec_id"), lit(100)) >= pct), path)
      val frac = graft.llm.Similarity.deltaFraction(spark, path)
      // the shared experiment definition — same helper LlmSpec's
      // regression floor asserts against
      val recall = graft.llm.Similarity.storedProbeRecall(spark, qs,
        referencePath = freshPath, candidatePath = path, k = 5, nprobe = 2)
      println(f"$pct,$frac%.3f,$recall%.3f")
    }
    spark.stop()
  }
}
