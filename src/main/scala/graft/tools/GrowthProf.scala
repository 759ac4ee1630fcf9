package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level wall profile of the three stream-growth lifecycle rows
  * (VERDICT r15 #1: they carry ~62 s of the 637 s driver total at
  * sf0.1). Times each phase of the lifecycle separately — fixture
  * write, offline quantizer train (IVF only), the 3-micro-batch
  * streamed growth, and the stored-index probe — so the optimization
  * target is measured, not guessed. Dev tool, not a driver surface. */
object GrowthProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GP_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val root = java.nio.file.Files.createTempDirectory("growthprof").toString

    // --- IVF growth, phase by phase (mirrors stream_ivf_index_growth)
    val emb = graft.core.Tables.embeddings(spark, dir)
    emb.count()
    val idx = s"$root/ann/idx"
    t("ivf_train_build") {
      graft.llm.Similarity.buildIvfIndex(spark,
        emb.where(pmod(col("vec_id"), lit(7)) =!= 3), idx, "prof")
    }
    val src = s"$root/ann/src"
    t("ivf_src_write") {
      emb.where(pmod(col("vec_id"), lit(7)) === 3)
        .repartition(3).write.parquet(src)
    }
    t("ivf_stream_3batches") {
      graft.stream.Ingest.maintainIvfIndex(spark,
        spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        idx, s"$root/ann/cp")
    }
    t("ivf_probe") {
      val qs = emb.where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.llm.Similarity.ivfTopKStored(spark, qs, idx, 5, nprobe = 2)
        .collect()
    }

    // --- band growth
    val docs = graft.core.Tables.documents(spark, dir)
    docs.count()
    val bidx = s"$root/band/idx"
    val bsrc = s"$root/band/src"
    t("band_src_write") {
      docs.where(pmod(col("doc_id"), lit(10)) =!= 7)
        .repartition(3).write.parquet(bsrc)
    }
    t("band_stream_3batches") {
      graft.stream.Ingest.maintainBandIndex(spark,
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(bsrc),
        bidx, s"$root/band/cp")
    }
    t("band_probe") {
      graft.llm.Dedup.incrementalNearDups(spark,
        docs.where(pmod(col("doc_id"), lit(10)) === 7), docs, bidx).collect()
    }

    // --- text growth
    val tidx = s"$root/text/idx"
    val tsrc = s"$root/text/src"
    t("text_src_write") { docs.repartition(3).write.parquet(tsrc) }
    t("text_stream_3batches") {
      graft.stream.Ingest.maintainTextIndex(spark,
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(tsrc),
        tidx, s"$root/text/cp")
    }
    t("text_probe") {
      graft.llm.Retrieval.bm25TopKStored(spark, tidx,
        Seq("spark", "merge", "dup"), 10).collect()
    }
    spark.stop()
  }
}
