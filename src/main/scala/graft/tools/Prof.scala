package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler (not part of the driver contract): times the
  * sub-stages of the hot bench queries so optimization targets the real
  * cost, not a guess. Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.Prof [namePrefix]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // [namePrefix] arg: run only the stages/queries whose PROF name
    // starts with it (sub-stage names keep their p_/sig_ prefixes, so
    // e.g. `Prof llm_` times just the llm queries)
    val prefix = args.headOption.getOrElse("")
    def t(name: String)(f: => Long): Unit = if (name.startsWith(prefix)) {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    import graft.llm.Dedup
    def q(name: String): Unit = {
      t(name) { graft.SparkEntry.queries(name)(spark, sfDir).count() }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // sub-stages of the portable near-dup pipeline
    t("sig_stage_1st") {
      Dedup.minhashSigsPortable(docs, "doc_id", "text", 32, 3).count()
    }
    t("sig_stage_2nd") {
      Dedup.minhashSigsPortable(docs, "doc_id", "text", 32, 3).count()
    }
    q("llm_dedup_near_minhash")
    q("llm_dedup_near_minhash")
    // fine-grained replica of nearDupPairsPortable stages; the stages
    // chain through shared frames, so the block runs all-or-nothing
    // (gated on its first stage name, not per-stage)
    if ("p_checkpoint_stacked".startsWith(prefix)) locally {
      import org.apache.spark.sql.functions._
      val k = 32; val r = 4; val bands = k / r
      val mh = Dedup.minhashSigsPortable(docs, "doc_id", "text", k, 3)
      val sigCols = (0 until bands).map { b =>
        concat((b * r until (b + 1) * r).map(i =>
          expr(s"lpad(lower(hex(m$i)), 8, '0')")): _*).as(s"sig$b")
      }
      val stacked = mh.select(col("id") +: sigCols: _*)
        .selectExpr("id",
          s"stack($bands, ${(0 until bands).map(b => s"$b, sig$b").mkString(", ")}) AS (band, sig)")
      var bandsM: org.apache.spark.sql.DataFrame = null
      t("p_checkpoint_stacked") { bandsM = stacked.localCheckpoint(true); bandsM.count() }
      var cand: org.apache.spark.sql.DataFrame = null
      t("p_cand_selfjoin") {
        cand = bandsM.select(col("band"), col("sig"), col("id").as("a_id"))
          .join(bandsM.select(col("band"), col("sig"), col("id").as("b_id")), Seq("band", "sig"))
          .where(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
        cand.count()
      }
      t("p_verify_join") {
        val wsets = docs.select(col("doc_id").as("id"),
          array_distinct(Dedup.words(col("text"))).as("ws"))
        cand
          .join(wsets.select(col("id").as("a_id"), col("ws").as("a_w")), "a_id")
          .join(wsets.select(col("id").as("b_id"), col("ws").as("b_w")), "b_id")
          .withColumn("jaccard", Dedup.jaccard(col("a_w"), col("b_w")))
          .where(col("jaccard") >= 0.5)
          .select("a_id", "b_id", "jaccard")
          .orderBy("a_id", "b_id").count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    q("llm_dedup_minhash_native")
    q("llm_sim_ivf")
    q("llm_sim_ivf")
    q("llm_knn_join")
    q("tsdb_series_corr")
    q("stream_session")
    q("stream_sliding")
    if (sys.env.contains("PROF_ALL")) {
      // time every registered query, print slowest-first
      val times = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => }
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        name -> (System.nanoTime() - t0) / 1e9
      }
      times.sortBy(-_._2).take(25).foreach { case (n, s) =>
        println(f"PROFALL $n%-40s $s%8.3f s")
      }
      println(f"PROFALL TOTAL ${times.map(_._2).sum}%8.3f s")
    }
    spark.stop()
  }
}
