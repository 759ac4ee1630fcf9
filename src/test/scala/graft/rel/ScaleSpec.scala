package graft.rel

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Scale-helper semantics: bucketed joins avoid the shuffle, salted
  * joins equal their unsalted counterpart, validation verdicts. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange on the bucket key") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_").toString
    Scale.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 8,
      Some(s"$wh/orders_b"))
    Scale.writeBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8, Some(s"$wh/lineitem_b"))
    // merge hint: at fixture scale Spark would broadcast; the production
    // case is fact⋈fact where SMJ is chosen anyway
    val joined = spark.table("orders_b").hint("merge")
      .join(spark.table("lineitem_b"), "o_orderkey")
      .where(col("l_quantity") > 0)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"),
      s"expected bucket-local sort-merge join:\n$plan")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }

  test("salted join returns exactly the plain join's rows") {
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).withColumnRenamed("p_partkey", "l_partkey"), "l_partkey")
      .select("l_orderkey", "l_linenumber", "p_name")
    val salted = Scale.saltedJoin(
      Tables.lineitem(spark, sf),
      Tables.part(spark, sf).withColumnRenamed("p_partkey", "l_partkey"),
      "l_partkey", salts = 8,
      saltSource = Seq("l_orderkey", "l_linenumber"))
      .select("l_orderkey", "l_linenumber", "p_name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("ingest validation flags each rule and splits accept/quarantine") {
    val pts = Seq(
      ("cpu.load", Map("ksid" -> "k1", "host" -> "h1"), 1704067200000L, 1.5),   // valid
      ("bad metric!", Map("ksid" -> "k1"), 1704067200000L, 1.0),                // charset
      ("cpu.load", Map("host" -> "h1"), 1704067200000L, 1.0),                   // no ksid
      ("cpu.load", Map("ksid" -> "k1"), 1L, 1.0),                               // ts bounds
      ("cpu.load", Map("ksid" -> "k1", "bad key" -> "v"), 1704067200000L, 1.0), // tag charset
      ("cpu.load", Map("ksid" -> "k1"), 1704067200000L, Double.NaN)             // NaN value
    ).toDF("metric", "tags", "ts_ms", "value")
    val v = graft.stream.Validate.validatePoints(pts)
    val errs = v.select("errors").as[Seq[String]].collect()
    assert(errs(0).isEmpty)
    assert(errs(1) == Seq("bad_metric"))
    assert(errs(2) == Seq("missing_ksid"))
    assert(errs(3) == Seq("ts_out_of_bounds"))
    assert(errs(4) == Seq("bad_tag_charset"))
    assert(errs(5) == Seq("bad_value"))
    val (ok, bad) = graft.stream.Validate.partition(v)
    assert(ok.count() == 1 && bad.count() == 5)
    assert(ok.columns.toSet == Set("metric", "tags", "ts_ms", "value"))
  }

  test("ttl tag: valid overrides pass, malformed quarantine, absent uses default") {
    val pts = Seq(
      ("cpu", Map("ksid" -> "k1", "ttl" -> "7"), 1704067200000L, 1.0),   // valid override
      ("cpu", Map("ksid" -> "k1", "ttl" -> "0"), 1704067200000L, 1.0),   // zero: invalid
      ("cpu", Map("ksid" -> "k1", "ttl" -> "7d"), 1704067200000L, 1.0),  // non-numeric
      ("cpu", Map("ksid" -> "k1"), 1704067200000L, 1.0)                  // absent: fine
    ).toDF("metric", "tags", "ts_ms", "value")
    val v = graft.stream.Validate.validatePoints(pts)
    val errs = v.select("errors").as[Seq[String]].collect()
    assert(errs(0).isEmpty && errs(3).isEmpty)
    assert(errs(1) == Seq("bad_ttl") && errs(2) == Seq("bad_ttl"))
    val ttls = pts.select(graft.stream.Validate
      .ttlMsFromTags(col("tags"), 14L * 86400000).as("t")).as[Long].collect()
    assert(ttls(0) == 7L * 86400000, "ttl tag must override the keyset default")
    assert(ttls(3) == 14L * 86400000, "tag-less points must use the keyset default")
  }

  test("validation quarantines NULL metric/tags/ts instead of passing them") {
    val pts = Seq(
      (Option.empty[String], Option(Map("ksid" -> "k")), Option(1704067200000L), 1.0),
      (Option("cpu"), Option.empty[Map[String, String]], Option(1704067200000L), 1.0),
      (Option("cpu"), Option(Map("ksid" -> "k")), Option.empty[Long], 1.0)
    ).toDF("metric", "tags", "ts_ms", "value")
    val v = graft.stream.Validate.validatePoints(pts)
    assert(v.where(col("is_valid")).count() == 0,
      "null inputs must fail validation, not vanish from the errors array")
  }

  test("timestamp normalization: seconds become ms, ms pass through") {
    val out = Seq(1704067200L, 1704067200000L).toDF("ts")
      .select(graft.stream.Validate.normalizeTsMs(col("ts")).as("ms"))
      .as[Long].collect().toSeq
    assert(out == Seq(1704067200000L, 1704067200000L))
  }
}
