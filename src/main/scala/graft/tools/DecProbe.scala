package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (r18): pins Spark's exact Cast(double AS DECIMAL)
  * semantics on edge values — NaN/Inf, overflow, shortest-repr ties —
  * so the FastDec fast path can be proven against it. */
object DecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vs = Seq(
      ("nan", Double.NaN), ("posinf", Double.PositiveInfinity),
      ("neginf", Double.NegativeInfinity),
      ("ovf4", 1.5e14), ("negovf4", -1.5e14), ("edge4", 0.99999999e14),
      ("tie", 0.00005), ("tieneg", -0.00005), ("tie2", 2.5e-4),
      ("tie3", 0.12345), ("half", 0.5), ("big", 9.87654321e13),
      ("small", 1.23456789e-11), ("zero", 0.0), ("negzero", -0.0),
      ("sub", java.lang.Double.MIN_VALUE))
    vs.foreach { case (n, x) =>
      val out =
        try {
          val r = Seq(x).toDF("x")
            .select(
              col("x").cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("d4"),
              col("x").cast(org.apache.spark.sql.types.DecimalType(28, 10)).as("d10"))
            .collect()(0)
          s"d4=${r.get(0)}\td10=${r.get(1)}"
        } catch { case e: Throwable =>
          s"throw:${e.getClass.getSimpleName}:${e.getMessage.take(60)}" }
      println(s"$n\tx=$x\t$out")
    }
    // reference: BigDecimal.valueOf path for the same values
    vs.foreach { case (n, x) =>
      val ref4 =
        try java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).toPlainString
        catch { case e: Exception => s"throw:${e.getClass.getSimpleName}" }
      println(s"ref\t$n\t$ref4")
    }
    spark.stop()
  }
}
