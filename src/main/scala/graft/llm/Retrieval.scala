package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval over a document corpus: BM25 scoring and
  * reciprocal-rank fusion (hybrid lexical + vector search).
  *
  * Scale shape (the reason this is NOT an inverted-index lookup here):
  * a scoring query carries a handful of terms, so per-document term
  * frequencies become literal `filter(ws, x -> x = term)` columns —
  * a MAP-ONLY pass with no explode and no (doc, term) shuffle. Corpus
  * statistics (N, avgdl, per-term document frequency) reduce to ONE
  * single-row aggregate (partial-agg tree, the `agg_global` shape),
  * broadcast back as a 1-row cross join. Scoring is then a second
  * map-only pass feeding TakeOrderedAndProject. Total cost at 100 TB:
  * two corpus scans, one single-row shuffle, zero wide shuffles. For
  * repeated interactive queries the stats pass amortizes (N/avgdl are
  * corpus constants; per-term df could be served off the persisted
  * `llm_inverted_index` artifact — same numbers, zero scans).
  */
object Retrieval {

  /** Classic BM25 (Robertson; k1/b free parameters, idf in the
    * +1-smoothed form `ln(1 + (N - df + 0.5)/(df + 0.5))` so scores
    * stay non-negative). Emits (idCol, bm25 = 4dp-rounded score) for
    * EVERY document — callers filter/rank. Determinism: every
    * arithmetic step is double with a fixed association order,
    * mirrored literally by the DuckDB oracle. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val ws = docs
      .withColumn("ws", filter(Dedup.words(col(textCol)), w => w =!= lit("")))
      .withColumn("dl", size(col("ws")).cast("double"))
    val tf = terms.zipWithIndex.foldLeft(ws) { case (df, (t, i)) =>
      df.withColumn(s"tf$i",
        size(filter(col("ws"), w => w === lit(t))).cast("double"))
    }.select(col(idCol) +: col("dl") +: terms.indices.map(i => col(s"tf$i")): _*)
    // ONE row: N, avgdl, df per term (dl/tf are exact small integers in
    // double, so the sums are order-independent — no decimal quantize
    // needed for cross-engine equality)
    val stats = tf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1).otherwise(0)).cast("double").as(s"df$i")): _*)
    val scored = tf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)))
      idf * (col(s"tf$i") * lit(k1 + 1.0)) /
        (col(s"tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored.select(col(idCol), graft.core.D.r4s(score).as("bm25"))
  }

  /** Top-k BM25 hits (score > 0 — documents sharing no query term are
    * not hits), deterministic (score desc, id) order. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame =
    bm25(docs, idCol, textCol, terms)
      .where(col("bm25") > 0)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)

  /** Dense rank positions of an ALREADY-SMALL ranked pool (a top-k
    * result, k rows). The unpartitioned window is deliberate — it runs
    * over k rows post-limit, never the corpus. Ranks off the 4dp-rounded
    * score so rank order is engine-portable. */
  private def ranked(pool: DataFrame, idCol: String, scoreCol: String,
                     rankCol: String): DataFrame =
    pool.select(col(idCol),
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol)))
        .cast("long").as(rankCol))

  /** Reciprocal-rank fusion of a lexical pool and a vector pool
    * (Cormack et al.: score = Σ 1/(rrfK + rank)); a document absent
    * from one list contributes 0 for it. Emits
    * (idCol, rank_b, rank_v, rrf) top-k by fused score. */
  def rrfFuse(lexPool: DataFrame, lexScore: String,
              vecPool: DataFrame, vecScore: String,
              idCol: String, rrfK: Int = 60, k: Int = 10): DataFrame = {
    val br = ranked(lexPool, idCol, lexScore, "rank_b")
    val vr = ranked(vecPool, idCol, vecScore, "rank_v")
    val kd = lit(rrfK.toDouble)
    br.join(vr, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_b"), col("rank_v"),
        graft.core.D.r4s(
          coalesce(lit(1.0) / (kd + col("rank_b")), lit(0.0)) +
          coalesce(lit(1.0) / (kd + col("rank_v")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }
}
