package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-only formatted-plan dumper (not part of the driver contract):
  * prints `explain("formatted")` for the named registered queries, in
  * the exact shape PLANS.md pins. Usage:
  *   tools/run.sh graft.tools.PlanDump <sfDir> <name> [name...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <name> [name...]")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"## $name\n")
      println("```")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println("```")
    }
    spark.stop()
  }
}
