package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only executed-plan dump for a named SparkEntry query (the first
  * step of any plan-shape investigation — what did the optimizer
  * actually do with the filter/join/expression placement?). Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.PlanPeek name [name...]
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanPeek queryName [queryName...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"== $name ==")
      println(graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
