package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (not part of the driver contract):
  * runs named SparkEntry queries N times each and prints per-run wall
  * times — the first step of any bench-outlier investigation. Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.QTime name [name...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QTime queryName [queryName...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args; i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).collect().length
      println(f"QTIME $name%-30s run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
