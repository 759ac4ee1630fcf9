package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-value tests for the engine-specific hash family (`fn_hash` has
  * no DuckDB oracle — hash implementations differ across engines), plus
  * the UDF surface. */
class FnSpec extends SparkSpec {
  import spark.implicits._

  test("md5 / sha2 / crc32 match published test vectors") {
    val row = Seq("abc").toDF("s").select(
      md5(col("s").cast("binary")).as("m5"),
      sha2(col("s").cast("binary"), 256).as("s2"),
      crc32(lit("123456789").cast("binary")).as("crc"))
      .as[(String, String, Long)].head()
    assert(row._1 == "900150983cd24fb0d6963f7d28e17f72")
    assert(row._2 == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(row._3 == 0xCBF43926L)
  }

  test("xxhash64 is stable across runs and distinct on distinct input") {
    val h = Seq(("a", "b")).toDF("x", "y")
      .select(xxhash64(col("x")).as("hx"), xxhash64(col("y")).as("hy"),
        xxhash64(col("x")).as("hx2"))
      .as[(Long, Long, Long)].head()
    assert(h._1 == h._3 && h._1 != h._2)
  }

  test("udf_scalar glob translation matches the pure function") {
    val glob2like = udf((g: String) => graft.tsdb.TagFilters.glob2like(g))
    val out = Seq("cli*", "a?c", "50%*").toDF("g")
      .select(glob2like(col("g"))).as[String].collect().toSeq
    assert(out == Seq("cli%", "a_c", "50\\%%"))
  }
}
