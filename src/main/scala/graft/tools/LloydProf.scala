package graft.llm
// dev tool living in the llm package for private[llm] access

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only sub-stage profiler for the scaled-k Lloyd TRAIN term
  * (VERDICT r15 #4: ~90 s of the 100× IVF build). Times each piece of
  * one ivfCentroids iteration separately at the replica's geometry
  * (k=800, stride=4 → 50k trained vecs) so "train is slow" resolves to
  * assignment vs mean-aggregate vs collect vs seed.
  * Usage: tools/run.sh graft.tools.LloydProf /tmp/graft_p100_x100 */
object LloydProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LloydProf <dirWithEmbeddingsParquet>")
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"LLOYDPROF $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    import graft.llm.Similarity
    val p = graft.llm.LlmQueries.scaledAnnParams(spark, dir)
    println(s"params: k=${p.k} stride=${p.trainStride}")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    t("warm_scan") { emb.count() }
    val trainVecs =
      if (p.trainStride > 1)
        emb.where(pmod(col("vec_id"), lit(p.trainStride.toLong)) === 0L)
      else emb
    t("train_count") { trainVecs.count() }
    // seed step
    val seeds = t("seed_build") {
      trainVecs.orderBy("vec_id").limit(p.k)
        .agg(expr("sort_array(collect_list(struct(vec_id, embedding)))").as("s"))
        .select(posexplode(col("s")))
        .select(col("pos").cast("int").as("centroid_id"),
          col("col").getField("embedding").as("cvec"))
    }
    val cs0 = t("seed_collect") { Similarity.collectCentroids(seeds) }
    // iteration sub-stages
    val assigned = t("assign_twolevel_job") {
      val a = Similarity.assignNearest(trainVecs, cs0)
      a.count()
      a
    }
    val meanAgg = assigned
      .select(col("centroid_id"), posexplode(col("embedding")))
      .groupBy("centroid_id", "pos")
      .agg((sum(graft.core.D.dec(col("col").cast("double"))).cast("double")
        / count(lit(1))).as("mean"))
      .groupBy("centroid_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), s -> CAST(s.mean AS FLOAT))")
        .as("cvec"))
    val cs1 = t("mean_agg_and_collect") { Similarity.collectCentroids(meanAgg) }
    t("iter2_full") {
      val a2 = Similarity.assignNearest(trainVecs, cs1)
      val m2 = a2
        .select(col("centroid_id"), posexplode(col("embedding")))
        .groupBy("centroid_id", "pos")
        .agg((sum(graft.core.D.dec(col("col").cast("double"))).cast("double")
          / count(lit(1))).as("mean"))
        .groupBy("centroid_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), s -> CAST(s.mean AS FLOAT))")
          .as("cvec"))
      Similarity.collectCentroids(m2)
    }
    t("whole_ivfCentroids") {
      Similarity.collectCentroids(Similarity.ivfCentroids(trainVecs, p.k, p.iters))
    }
    // skew diagnosis: per-super CELL sizes (centroids per coarse cell)
    // before and after the mean update — a giant cell makes the fine
    // join score toward n·k instead of n·sqrt(k)
    def cellStats(tag: String, cs: Array[(Int, Seq[Float], Double)]): Unit = {
      val (_, c2s) = Similarity.superCentroids(cs)
      val sizes = c2s.values.groupBy(identity).map(_._2.size).toSeq.sorted
      println(s"CELLS $tag: n=${sizes.size} max=${sizes.max} " +
        s"p90=${sizes(sizes.size * 9 / 10)} median=${sizes(sizes.size / 2)} " +
        s"sum=${sizes.sum}")
    }
    cellStats("seed(cs0)", cs0)
    cellStats("iter1(cs1)", cs1)
    // route A/B at this geometry: literal least-over-structs vs
    // broadcast+min_by vs two-level, same centroids, same vectors —
    // the dispatch ceilings should reflect these numbers, not lore
    if (cs0.length >= 2) {
      t("assign_literal") {
        Similarity.assignByLiterals(trainVecs, cs0).count()
      }
      t("assign_broadcast") {
        Similarity.assignByBroadcast(trainVecs, cs0).count()
      }
      t("assign_twolevel") {
        Similarity.assignByTwoLevel(trainVecs, cs0).count()
      }
    }
    spark.stop()
  }
}
