package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scaling probe: replicate the events fixture 10× (shifted ids,
  * same time range → 10× the per-bucket density) and time representative
  * operators at 1× and 10× to check the near-linear-scaling claim in
  * PERF.md empirically. Run: `SPARK_GRAFT_CPUS=32 tools/run.sh graft.ScaleProbe`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    // stable scratch dir, rewritten (mode overwrite) each run: bounds
    // disk use instead of leaking a replicated copy per run. The
    // replication itself still runs every time — it depends on the
    // source sf — and the dir is single-writer by contract (one probe
    // at a time, like the state tables).
    val big = {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_x10")
      java.nio.file.Files.createDirectories(d); d.toString
    }
    val ev = core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    (0 until 10).map(i => ev.withColumn("event_id", col("event_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/events.parquet")
    // documents 10×: shifted ids AND per-replica word prefixes, so each
    // replica keeps the 1× corpus's internal near-dup structure but
    // shares NO shingles across replicas. Replicating identical texts
    // would instead multiply every dup cluster by 10 (C(10,2)=45
    // candidate pairs per doc) and the probe would measure quadratic
    // pair blowup, not corpus scaling.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    (0 until 10).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text",
          expr(s"array_join(transform(split(text, ' '), w -> concat('x$i', w)), ' ')")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/documents.parquet")

    // lineitem 10× (order/part keys only — the graph probes prune to
    // these two columns anyway): BOTH keys shift per replica, so the
    // co-purchase graph becomes 10 disjoint copies — 10× nodes, 10×
    // edges, per-replica structure (basket sizes, component diameter)
    // unchanged. That is what corpus growth looks like to a graph op;
    // sharing part keys across replicas would instead multiply edge
    // DENSITY and measure basket² blowup, not scaling.
    val li1 = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    (0 until 10).map(i => li1
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/lineitem.parquet")

    // embeddings 10×: shifted ids, vectors unchanged — replica 0 keeps
    // the lowest ids, so the deterministic quantizer picks the SAME
    // seeds at both scales; each replica adds corpus mass inside the
    // same cluster structure (what a probe-join scale-up looks like)
    val emb1 = spark.read.parquet(s"$sf/embeddings.parquet")
    (0 until 10).map(i => emb1.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/embeddings.parquet")

    // build-only mode: refresh /tmp/graft_x10 for the full-family Bench
    // sweep without re-timing this probe's own ~40 rows
    if (sys.env.contains("SPARK_GRAFT_BUILD_ONLY")) { spark.stop(); return }

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      // release localCheckpoint blocks the finished operator pinned
      // (pair pipeline + one per label-propagation round) so storage
      // pressure from one probe never skews the next timing — same
      // pattern as Bench/Verify (ADVICE r2); excluded from the timing
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    def flagship(dir: String): Long = tsdb.Pipeline.flagship(spark, dir).count()
    def downsample(dir: String): Long =
      tsdb.Downsample(core.Tables.events(spark, dir),
        Seq("event_type", "user_id"), 3600000L, "avg").count()
    def sessionize(dir: String): Long =
      SparkEntry.queries("win_sessionize")(spark, dir).count()
    def minhash(dir: String): Long =
      SparkEntry.queries("llm_dedup_near_minhash")(spark, dir).count()
    def clusters(dir: String): Long =
      SparkEntry.queries("llm_dedup_clusters")(spark, dir).count()
    // stage split: shingle+digest+32-lane min aggregate ONLY (no band
    // join / verify) — tells whether signature build or candidate
    // verification dominates the dedup cost. Same code path as the
    // full pipeline (Dedup.minhashSigsPortable), not a re-implementation.
    // batched ANN: 4 queries against the IVF index — candidate volume
    // scales with nprobe/k of the corpus, the per-query top-k is
    // WindowGroupLimit-pruned map-side before the query_id exchange
    def ivfBatch(dir: String): Long = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val qs = e.where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      llm.Similarity.ivfTopKBatch(e, qs,
        llm.Similarity.ivfCentroids(e, 8, iters = 2), 5, nprobe = 2).count()
    }
    // stored-index lifecycle, split: BUILD (the one-time training cost —
    // Lloyd + PQ codebooks + inverted-list rewrite) vs PROBE (the
    // steady-state per-query cost, which is what serving pays). The
    // inline ivf_batch row above carries both fused; the split shows
    // the probe side staying far below the inline cost at 10×.
    val idxRoot = {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_x10_idx")
      java.nio.file.Files.createDirectories(d); d.toString
    }
    def idxPath(dir: String) = s"$idxRoot/${if (dir == sf) "x1" else "x10"}"
    def ivfStoredBuild(dir: String): Long = {
      llm.Similarity.buildIvfIndex(spark,
        spark.read.parquet(s"$dir/embeddings.parquet"), idxPath(dir), "probe")
      1L
    }
    def ivfStoredProbe(dir: String): Long = {
      val qs = spark.read.parquet(s"$dir/embeddings.parquet")
        .where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      llm.Similarity.ivfTopKStored(spark, qs, idxPath(dir), 5, nprobe = 2).count()
    }
    // takedown split: DELETE (one atomic tombstone delta — cost is the
    // centroid-lookup semi-join over the lists plus a marker write) vs
    // the PROBE AFTER deletion (steady state — the broadcast anti-join
    // over takedown-sized markers is the only extra plan node, so this
    // row should track ivf_stored_probe, not the corpus)
    // hybrid search: the same stored probe with a metadata predicate
    // pushed into the lists scan — should track (or beat) the plain
    // stored probe, since the filter only SHRINKS the candidate fetch
    def ivfFilteredProbe(dir: String): Long = {
      val qs = spark.read.parquet(s"$dir/embeddings.parquet")
        .where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      llm.Similarity.ivfTopKStoredFiltered(spark, qs, idxPath(dir),
        col("label") < 5, 5, nprobe = 2).count()
    }
    def ivfDelete(dir: String): Long = {
      llm.Similarity.deleteFromIvfIndex(spark,
        spark.read.parquet(s"$dir/embeddings.parquet")
          .where(pmod(col("vec_id"), lit(101)) === 5).select("vec_id"),
        idxPath(dir))
      1L
    }
    // behavioral analytics: stages are user-keyed aggregates over the
    // filtered event scan — 10× events per user should cost ~the scan,
    // with the post-aggregate frames (user-sized) unchanged
    def funnel(dir: String): Long =
      SparkEntry.queries("evt_funnel")(spark, dir).count()
    def wau(dir: String): Long =
      SparkEntry.queries("evt_wau_rolling")(spark, dir).count()
    // graph family: edge build is the basket-bounded self-join; the
    // three measures then differ in what they move per edge (pagerank:
    // two broadcast node-state joins per iteration; triangles:
    // broadcast forward adjacency; components: closure rounds — flat
    // round count on the disjoint-replica corpus)
    def pagerank(dir: String): Long =
      SparkEntry.queries("graph_pagerank")(spark, dir).count()
    def pagerankCopart(dir: String): Long =
      SparkEntry.queries("graph_pagerank_copart")(spark, dir).count()
    def triangles(dir: String): Long =
      SparkEntry.queries("graph_triangles")(spark, dir).count()
    def components(dir: String): Long =
      SparkEntry.queries("graph_components")(spark, dir).count()
    // dedup-eval truth side: inverted-shingle Σ df² — the disjoint
    // replica shingle spaces keep df flat at 10× docs, so the probe
    // checks truth cost tracks corpus size, NOT sample² (the shape the
    // r10 rewrite removed: 45 s at 1×, ~100× at 10×)
    def dedupEval(dir: String): Long =
      SparkEntry.queries("llm_dedup_eval")(spark, dir).count()
    def minhashSigOnly(dir: String): Long =
      // aggregate a lane, don't count(): column pruning under count()
      // drops the signature expression entirely and the probe would time
      // only the scan (evaluating m0 forces the whole per-doc digest
      // pass — all 32 lanes come from the one native expression)
      llm.Dedup.minhashSigsPortable(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
        .agg(sum(col("m0")), count(lit(1))).head().getLong(1)

    // r11 additions. CMS: the sketch is vocab-then-16k-bounded, so 10×
    // docs should cost ~the token scan. Bloom: the bit table is
    // m-bounded (at 10× the 65536-bit demo filter SATURATES — all
    // probes read maybe; the probe measures COST scaling, the
    // saturation itself is the documented m∝n sizing lesson).
    // Adamic–Adar: wedge-bounded explode over the disjoint-replica
    // graph — 10× edges, per-replica wedge structure unchanged.
    // LPA: two fixed rounds, each one edge⋈labels join — should track
    // the edge count like components. Sequence detect: one window
    // sort over 10× event rows.
    def cms(dir: String): Long =
      SparkEntry.queries("llm_cms_heavy")(spark, dir).count()
    def bloom(dir: String): Long =
      SparkEntry.queries("llm_bloom_prefilter")(spark, dir).count()
    def adamicAdar(dir: String): Long =
      SparkEntry.queries("graph_adamic_adar")(spark, dir).count()
    def adamicAdarCopart(dir: String): Long =
      SparkEntry.queries("graph_adamic_adar_copart")(spark, dir).count()
    def lpa(dir: String): Long =
      SparkEntry.queries("graph_label_propagation")(spark, dir).count()
    def kcore(dir: String): Long =
      SparkEntry.queries("graph_kcore")(spark, dir).count()
    def kcoreCopart(dir: String): Long =
      SparkEntry.queries("graph_kcore_copart")(spark, dir).count()
    def seqDetect(dir: String): Long =
      SparkEntry.queries("evt_sequence_detect")(spark, dir).count()

    // r13 additions — the retired-quadratic trio, probed with the
    // production sizing: cluster count k ∝ corpus / target-list-size
    // (250), so per-query candidate fetch (kNN join) and per-cluster
    // pair blocks (cosine dedup) stay CONSTANT as the corpus grows —
    // k=8 at 1× (2k vectors), k=80 at 10× (20k). r14: this sizing IS
    // the registered one ([[llm.LlmQueries.scaledAnnK]]); the probe
    // reuses that formula so there is exactly one definition of it.
    def knnIdxPath(dir: String) = s"$idxRoot/knn_${if (dir == sf) "x1" else "x10"}"
    def knnIvfBuild(dir: String): Long = {
      llm.Similarity.buildIvfIndex(spark,
        spark.read.parquet(s"$dir/embeddings.parquet"), knnIdxPath(dir),
        "knnprobe", llm.LlmQueries.scaledAnnParams(spark, dir))
      1L
    }
    def knnJoinIvf(dir: String): Long =
      llm.Similarity.ivfKnnJoinStored(spark, knnIdxPath(dir), 3, nprobe = 2)
        .count()
    def dedupCosineBlocked(dir: String): Long =
      llm.Similarity.blockedPairCosines(
        llm.Similarity.readLists(spark, knnIdxPath(dir))
          .select("vec_id", "embedding", "nrm", "centroid_id"),
        "centroid_id", ordered = true)
        .where(col("sim") >= 0.35).count()
    def cohesion(dir: String): Long =
      SparkEntry.queries("llm_embed_label_cohesion")(spark, dir).count()
    // stream-growth lifecycle at 10×: wipe the growth root, run the
    // registered query — the timing covers the FULL growth (3 stream
    // micro-batches, each 10× bigger at 10×) plus its serving probe;
    // O(batch) growth should scale with batch bytes, far under 10×
    // wall-clock (per-batch overhead dominates at fixture scale)
    def streamGrowth(name: String)(dir: String): Long = {
      llm.LlmQueries.resetGrowthArtifact(dir, name)
      SparkEntry.queries(name)(spark, dir).count()
    }
    val bandGrow = streamGrowth("stream_band_index_growth") _
    val ivfGrow = streamGrowth("stream_ivf_index_growth") _
    val textGrow = streamGrowth("stream_text_index_growth") _

    // the Similarity chained-CASE ceiling, measured (r11): assign every
    // vector to its nearest of k=256 centroids — 4–32× the fixture's
    // k, the regime where the literal expression tree nears Janino's
    // 64 KB method limit — via (a) the literal least-over-structs
    // projection the engine uses at k≤64 and (b) the broadcast-relation
    // join + min_by swap documented at Similarity.collectCentroids as
    // the production-k shape. Same assignment semantics; the probe
    // times the code-shape difference and its 10× scaling.
    val k256 = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") < 256)
      .select(col("vec_id").cast("int").as("centroid_id"),
        col("embedding").as("cvec"))
    def assignLiteral(dir: String): Long =
      llm.Similarity.assignToCentroids(
        spark.read.parquet(s"$dir/embeddings.parquet"), k256)
        .agg(sum(col("centroid_id")), count(lit(1))).head().getLong(1)
    def assignBroadcast(dir: String): Long = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val cb = broadcast(k256.withColumn(
        "sq_c", llm.Similarity.dotExpr("cvec", "cvec")))
      emb.crossJoin(cb)
        .select(col("vec_id"), struct(
          (col("sq_c") - lit(2.0) * llm.Similarity.dotExpr("embedding", "cvec"))
            .as("dist"),
          col("centroid_id")).as("dc"))
        .groupBy("vec_id").agg(min(col("dc")).as("m"))
        .select(col("vec_id"), col("m.centroid_id").as("centroid_id"))
        .agg(sum(col("centroid_id")), count(lit(1))).head().getLong(1)
    }

    // warm the datasets AND each query shape (codegen compiles on first
    // run; timing it against 1× would flatter the 10× ratio)
    core.Tables.events(spark, sf).count(); core.Tables.events(spark, big).count()
    flagship(sf); downsample(sf); sessionize(sf); minhash(sf); minhashSigOnly(sf)
    funnel(sf); wau(sf)
    clusters(sf); pagerank(sf); pagerankCopart(sf); triangles(sf); components(sf)
    dedupEval(sf)
    ivfBatch(sf); ivfStoredBuild(sf); ivfStoredProbe(sf)
    ivfFilteredProbe(sf)
    ivfDelete(sf); ivfStoredProbe(sf) // warm the anti-join probe shape too
    assignLiteral(sf); assignBroadcast(sf)
    cms(sf); bloom(sf); adamicAdar(sf); adamicAdarCopart(sf); lpa(sf)
    kcore(sf); kcoreCopart(sf)
    seqDetect(sf)
    knnIvfBuild(sf); knnJoinIvf(sf); dedupCosineBlocked(sf); cohesion(sf)
    bandGrow(sf); ivfGrow(sf); textGrow(sf)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val rows = Seq(
      ("flagship_pipeline", time(flagship(sf)), time(flagship(big))),
      ("downsample_1h_avg", time(downsample(sf)), time(downsample(big))),
      ("sessionize", time(sessionize(sf)), time(sessionize(big))),
      ("minhash_neardup", time(minhash(sf)), time(minhash(big))),
      ("minhash_sig_only", time(minhashSigOnly(sf)), time(minhashSigOnly(big))),
      ("evt_funnel", time(funnel(sf)), time(funnel(big))),
      ("evt_wau_rolling", time(wau(sf)), time(wau(big))),
      // the 10× corpus has the same per-replica dup structure (disjoint
      // shingle spaces), so cluster count scales 10× while diameter —
      // and hence the round count — stays flat: the probe checks the
      // closure cost tracks the edge count, not rounds × corpus
      ("neardup_clusters", time(clusters(sf)), time(clusters(big))),
      ("graph_pagerank", time(pagerank(sf)), time(pagerank(big))),
      ("graph_pagerank_copart", time(pagerankCopart(sf)), time(pagerankCopart(big))),
      ("graph_triangles", time(triangles(sf)), time(triangles(big))),
      ("graph_components", time(components(sf)), time(components(big))),
      ("dedup_eval_truth", time(dedupEval(sf)), time(dedupEval(big))),
      ("ivf_batch_topk", time(ivfBatch(sf)), time(ivfBatch(big))),
      // the timed builds rebuild from scratch, clearing the warmup's
      // tombstones — stored_probe times the clean index, deleted_probe
      // the post-takedown one
      ("ivf_stored_build", time(ivfStoredBuild(sf)), time(ivfStoredBuild(big))),
      ("ivf_stored_probe", time(ivfStoredProbe(sf)), time(ivfStoredProbe(big))),
      ("ivf_filtered_probe", time(ivfFilteredProbe(sf)), time(ivfFilteredProbe(big))),
      ("ivf_takedown_delete", time(ivfDelete(sf)), time(ivfDelete(big))),
      ("ivf_deleted_probe", time(ivfStoredProbe(sf)), time(ivfStoredProbe(big))),
      ("centroid_assign_literal_k256", time(assignLiteral(sf)), time(assignLiteral(big))),
      ("centroid_assign_broadcast_k256", time(assignBroadcast(sf)), time(assignBroadcast(big))),
      ("cms_heavy_hitters", time(cms(sf)), time(cms(big))),
      ("bloom_prefilter", time(bloom(sf)), time(bloom(big))),
      ("graph_adamic_adar", time(adamicAdar(sf)), time(adamicAdar(big))),
      ("graph_adamic_adar_copart", time(adamicAdarCopart(sf)), time(adamicAdarCopart(big))),
      ("graph_label_propagation", time(lpa(sf)), time(lpa(big))),
      ("graph_kcore", time(kcore(sf)), time(kcore(big))),
      ("graph_kcore_copart", time(kcoreCopart(sf)), time(kcoreCopart(big))),
      ("evt_sequence_detect", time(seqDetect(sf)), time(seqDetect(big))),
      ("knn_ivf_build_scaledk", time(knnIvfBuild(sf)), time(knnIvfBuild(big))),
      ("llm_knn_join_ivf_scaledk", time(knnJoinIvf(sf)), time(knnJoinIvf(big))),
      ("llm_dedup_cosine_scaledk", time(dedupCosineBlocked(sf)), time(dedupCosineBlocked(big))),
      ("llm_embed_label_cohesion", time(cohesion(sf)), time(cohesion(big))),
      ("stream_band_index_growth", time(bandGrow(sf)), time(bandGrow(big))),
      ("stream_ivf_index_growth", time(ivfGrow(sf)), time(ivfGrow(big))),
      ("stream_text_index_growth", time(textGrow(sf)), time(textGrow(big))))
    println("operator,t_1x_sec,t_10x_sec,ratio")
    rows.foreach { case (n, a, b) => println(f"$n,$a%.2f,$b%.2f,${b / a}%.1f") }
    spark.stop()
  }
}

/** Celebrity-skew probe (VERDICT r16 #2): the Adamic–Adar family's one
  * admitted scale-killer is a super-node whose maxDeg × 8 B adjacency
  * row breaks broadcast AND copart (the attach join replicates the
  * hub's array once per incident candidate pair — deg(hub)² longs of
  * shuffle). Build the 10× disjoint co-purchase graph (the ScaleProbe
  * construction) and INJECT a hub part into EVERY order — the hub then
  * neighbors every node (~200k degree), which is exactly the graph the
  * uncapped plans cannot survive (printed estimate: deg² × 8 B ≈
  * hundreds of GB of attach shuffle, vs this box's scratch). The probe
  * then runs the REGISTERED `graph_adamic_adar_capped` row on that
  * graph and must COMPLETE in ordinary copart time: the cap drops the
  * hub before any adjacency is built, so every row is ≤ cap × 8 B by
  * construction. Run: `SPARK_GRAFT_CPUS=32 tools/run.sh graft.SkewProbe`. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val skew = {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_skew")
      java.nio.file.Files.createDirectories(d); d.toString
    }
    // 10× disjoint replicas (the ScaleProbe lineitem construction) plus
    // ONE hub part present in EVERY order of every replica
    val li1 = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val reps = (0 until 10).map(i => li1
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val hub = reps.select(col("l_orderkey")).distinct()
      .withColumn("l_partkey", lit(999999999L))
    reps.unionByName(hub)
      .write.mode("overwrite").parquet(s"$skew/lineitem.parquet")

    // degree stats: the hub's degree and what the UNCAPPED attach would
    // pay for it (the reason the uncapped run is estimated, not run)
    val li = spark.read.parquet(s"$skew/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val e0 = li.alias("a").join(li.alias("b"), "ok")
      .where(col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
    val es = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
    val deg = es.groupBy("src").agg(count(lit(1)).as("deg"))
    val st = deg.agg(count(lit(1)), max(col("deg")),
      sum(when(col("deg") > 150, 1L).otherwise(0L))).head()
    val (nodes, maxDeg, over) = (st.getLong(0), st.getLong(1), st.getLong(2))
    println(f"skew graph: $nodes%d nodes, max degree $maxDeg%d, " +
      f"$over%d nodes above cap 150")
    println(f"uncapped hub attach estimate: deg^2 x 8B = " +
      f"${maxDeg.toDouble * maxDeg * 8 / 1e9}%.1f GB of adjacency shuffle " +
      "(NOT run - this is the failure mode the cap removes)")

    val t0 = System.nanoTime()
    val rows = SparkEntry.queries("graph_adamic_adar_capped")(spark, skew)
      .collect()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"graph_adamic_adar_capped on the skewed 10x graph: " +
      f"${rows.length}%d rows in $dt%.1f s (COMPLETED - bounded per-row " +
      "memory; hub excluded before any adjacency build)")
    require(rows.nonEmpty, "capped AA returned no rows on the skewed graph")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    // same-session comparator: the UNSKEWED 10x graph through the same
    // capped row — the denominator that says how much of the skewed
    // wall is the graph family's ordinary 10x price vs the skew's
    // residual (cap semi joins + the hub-fattened edge build)
    val plain = {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_skew_plain")
      java.nio.file.Files.createDirectories(d); d.toString
    }
    reps.write.mode("overwrite").parquet(s"$plain/lineitem.parquet")
    val t1 = System.nanoTime()
    val rowsP = SparkEntry.queries("graph_adamic_adar_capped")(spark, plain)
      .collect()
    val dtP = (System.nanoTime() - t1) / 1e9
    println(f"graph_adamic_adar_capped on the UNSKEWED 10x graph: " +
      f"${rowsP.length}%d rows in $dtP%.1f s (comparator - skew residual " +
      f"${dt / dtP}%.1fx)")
    spark.stop()
  }
}

/** The 100× probe tier (judge r14 #4): 10× hides quadratics with small
  * constants, so the CONTESTED rows get a deeper point — the scaled-k
  * ANN pair, the graph broadcast-vs-copart twins (pagerank/kcore/
  * adamic-adar, BOTH regimes forced through the registered dispatcher),
  * and the band-index stream growth. Replicas are disjoint (shifted
  * ids, per-replica word prefixes, disjoint graph copies — the same
  * construction the x10 probe documents), built only for the SMALL
  * tables (embeddings/documents/lineitem keys — disk is the
  * constraint). Every row is timed at 1×/10×/100× in one JVM so the
  * ratios are apples-to-apples. Run:
  * `SPARK_DRIVER_MEM=64g tools/run.sh graft.ScaleProbe100`. */
object ScaleProbe100 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the FORCED-broadcast regimes collect a ~2 GB adjacency to the
      // driver at the 100× replica (the real dispatcher picks copart
      // there — the forced ceiling exists only so the probe can measure
      // the losing side); r15: the degree-packed arrays compress worse
      // than raw sorted ids and crossed the 1 GB default maxResultSize,
      // aborting the row
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def scratch(name: String): String = {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), name)
      java.nio.file.Files.createDirectories(d); d.toString
    }
    // replicate n disjoint copies via a broadcast range cross join —
    // one shuffle-free pass per table, not an n-way union
    def build(dir: String, n: Int): Unit = {
      val reps = spark.range(n).toDF("i")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      li.crossJoin(reps)
        .select((col("l_orderkey") + col("i") * 100000000L).as("l_orderkey"),
          (col("l_partkey") + col("i") * 10000000L).as("l_partkey"))
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      docs.crossJoin(reps)
        .select((col("doc_id") + col("i") * 10000000L).as("doc_id"),
          expr("array_join(transform(split(text, ' '), " +
            "w -> concat('x', CAST(i AS STRING), 'r', w)), ' ')").as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      emb.crossJoin(reps)
        .select((col("vec_id") + col("i") * 10000000L).as("vec_id"),
          col("embedding"), col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }

    val x10 = scratch("graft_p100_x10")
    val x100 = scratch("graft_p100_x100")
    val tb10 = time { build(x10, 10); 1L }
    val tb100 = time { build(x100, 100); 1L }
    println(f"# replica build: x10 $tb10%.1f s, x100 $tb100%.1f s")

    // ANN trio at the REGISTERED scaled-k sizing (k = max(8, n/250):
    // 8 / 80 / 800) — its own index path per scale, so verify
    // artifacts are never clobbered
    val idxRoot = scratch("graft_p100_idx")
    def knnIdx(dir: String) = s"$idxRoot/${dir.replaceAll("[^A-Za-z0-9._-]", "_")}"
    def annBuild(dir: String): Long = {
      llm.Similarity.buildIvfIndex(spark,
        spark.read.parquet(s"$dir/embeddings.parquet"), knnIdx(dir),
        "p100", llm.LlmQueries.scaledAnnParams(spark, dir))
      1L
    }
    def annKnnJoin(dir: String): Long =
      llm.Similarity.ivfKnnJoinStored(spark, knnIdx(dir), 3, nprobe = 2).count()
    def annDedup(dir: String): Long =
      llm.Similarity.blockedPairCosines(
        llm.Similarity.readLists(spark, knnIdx(dir))
          .select("vec_id", "embedding", "nrm", "centroid_id"),
        "centroid_id", ordered = true)
        .where(col("sim") >= 0.35).count()

    // graph twins, BOTH regimes through the registered rows: the
    // dispatcher row forced to broadcast via an effectively-infinite
    // budget, the pinned _copart row for the co-partitioned form.
    // (Left to itself the dispatcher picks broadcast at 1×/10× and
    // flips to copart at 100× — 2M nodes × 32 B > 10 MB.)
    def forced(name: String, dir: String): Long = {
      spark.conf.set(rel.Graph.NodeStateBudgetKey, Long.MaxValue.toString)
      try SparkEntry.queries(name)(spark, dir).count()
      finally spark.conf.unset(rel.Graph.NodeStateBudgetKey)
    }
    def bcast(name: String)(dir: String): Long = forced(name, dir)
    def copart(name: String)(dir: String): Long =
      SparkEntry.queries(name)(spark, dir).count()
    def bandGrow(dir: String): Long = {
      llm.LlmQueries.resetGrowthArtifact(dir, "stream_band_index_growth")
      SparkEntry.queries("stream_band_index_growth")(spark, dir).count()
    }

    // warm every shape at 1× (codegen compiles once; timing the first
    // run against 1× would flatter the big ratios)
    annBuild(sf); annKnnJoin(sf); annDedup(sf)
    bcast("graph_pagerank")(sf); copart("graph_pagerank_copart")(sf)
    bcast("graph_kcore")(sf); copart("graph_kcore_copart")(sf)
    bcast("graph_adamic_adar")(sf); copart("graph_adamic_adar_copart")(sf)
    bandGrow(sf)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    val rows = Seq[(String, String => Long)](
      ("knn_ivf_build_scaledk", annBuild),
      ("llm_knn_join_ivf_scaledk", annKnnJoin),
      ("llm_dedup_cosine_scaledk", annDedup),
      ("graph_pagerank_bcast", bcast("graph_pagerank")),
      ("graph_pagerank_copart", copart("graph_pagerank_copart")),
      ("graph_kcore_bcast", bcast("graph_kcore")),
      ("graph_kcore_copart", copart("graph_kcore_copart")),
      ("graph_adamic_adar_bcast", bcast("graph_adamic_adar")),
      ("graph_adamic_adar_copart", copart("graph_adamic_adar_copart")),
      ("stream_band_index_growth", bandGrow))
    // optional row filter (comma-separated names) for targeted re-runs
    val only = sys.env.get("SPARK_GRAFT_P100_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    println("operator,t_1x_sec,t_10x_sec,t_100x_sec,r10,r100")
    rows.filter(r => only.forall(_.contains(r._1))).foreach { case (n, f) =>
      val a = time(f(sf)); val b = time(f(x10)); val c = time(f(x100))
      println(f"$n,$a%.2f,$b%.2f,$c%.2f,${b / a}%.1f,${c / a}%.1f")
    }
    spark.stop()
  }
}
