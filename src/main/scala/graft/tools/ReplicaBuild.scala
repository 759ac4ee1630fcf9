package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: (re)build just the x-N embeddings replica dir that
  * BuildProf / IvfProf consume, without paying ScaleProbe's full row
  * sweep. Usage: `tools/run.sh graft.tools.ReplicaBuild <outDir> <n>`. */
object ReplicaBuild {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ReplicaBuild <outDir> <n>")
    val (out, n) = (args(0), args(1).toInt)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = spark.range(n).toDF("i")
    spark.read.parquet(s"$sf/embeddings.parquet").crossJoin(reps)
      .select((col("vec_id") + col("i") * 10000000L).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    spark.stop()
  }
}
