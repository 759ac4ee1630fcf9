package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Determinism: dot products / norms accumulate per-element products as
  * DECIMAL(18,4) (rule D3) so results are independent of evaluation
  * order and identical to the explode-based DuckDB oracle formulation.
  *
  * Scale design:
  *  - brute-force top-k = broadcast the (single) query vector, one
  *    codegen'd projection per row, then TakeOrderedAndProject — no
  *    shuffle of the corpus;
  *  - kNN join is confined within partitions of a blocking key (label /
  *    LSH bucket), so the pair count is Σ bucket², never corpus²;
  *  - the LSH prefilter (random-hyperplane signs via fixed-seed hashes)
  *    gives the sub-linear bucket path for 100 TB corpora.
  */
object Similarity {

  /** Order-independent dot product of two ARRAY<FLOAT>/<DOUBLE> columns
    * named by SQL fragment (pass simple column names). */
  def dotExpr(a: String, b: String): Column =
    expr(s"""CAST(aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
             CAST(0.0 AS DECIMAL(38,4)),
             (acc, p) -> CAST(acc + CAST(p AS DECIMAL(18,4)) AS DECIMAL(38,4))) AS DOUBLE)""")

  def normExpr(a: String): Column = sqrt(dotExpr(a, a))

  /** cosine = dot / (|a| * |b|), rounded 4dp. */
  def cosineExpr(a: String, b: String): Column =
    round(dotExpr(a, b) / (normExpr(a) * normExpr(b)), 4)

  /** Brute-force top-k cosine neighbors of one query vector. */
  def cosineTopK(vectors: DataFrame, queryVec: DataFrame, k: Int): DataFrame =
    vectors.crossJoin(broadcast(queryVec))
      .select(col("vec_id"), cosineExpr("embedding", "qv").as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)

  /** Exact kNN join within a blocking column (here: label). */
  def knnJoinPerGroup(vectors: DataFrame, blockCol: String, k: Int): DataFrame = {
    val a = vectors.select(col(blockCol).as("blk"), col("vec_id").as("a_id"),
      col("embedding").as("av"))
    val b = vectors.select(col(blockCol).as("blk"), col("vec_id").as("b_id"),
      col("embedding").as("bv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    a.join(b, Seq("blk"))
      .where(col("a_id") =!= col("b_id"))
      .withColumn("sim", cosineExpr("av", "bv"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col("a_id").as("vec_id"), col("rn"), col("b_id").as("neighbor_id"), col("sim"))
      .orderBy("vec_id", "rn")
  }

  /** Random-hyperplane LSH bucket: sign bits of `planes` pseudo-random
    * projections. Hyperplane h's component for dimension i is derived
    * from xxhash64(i, h) mapped to ±1 — fixed seeds, no RNG state, so
    * executors agree without coordination. Returns a BIGINT bucket id. */
  def lshBucket(embedding: String, planes: Int): Column =
    expr(s"""aggregate(zip_with(
         transform(sequence(0, $planes - 1), h ->
           CASE WHEN aggregate(zip_with($embedding, sequence(0, size($embedding) - 1),
             (x, i) -> CAST(x AS DOUBLE) * IF((xxhash64(i, h) & 1L) = 1L, 1.0D, -1.0D)),
             CAST(0.0 AS DECIMAL(38,4)),
             (acc, p) -> CAST(acc + CAST(p AS DECIMAL(18,4)) AS DECIMAL(38,4))) > 0 THEN 1L ELSE 0L END),
         sequence(0, $planes - 1), (bit, h) -> bit * shiftleft(1L, cast(h as int))),
         0L, (a, b) -> a + b)""")

  /** ANN top-k via LSH bucketing: probe only the query's bucket. The
    * baseline quality path is [[cosineTopK]]; this is the sub-linear
    * scale path (bucket column is precomputable + partitionable). */
  def annTopKLsh(vectors: DataFrame, queryVec: DataFrame, k: Int, planes: Int = 8): DataFrame = {
    val bucketed = vectors.withColumn("bucket", lshBucket("embedding", planes))
    val qb = queryVec.withColumn("qbucket", lshBucket("qv", planes))
    bucketed.join(broadcast(qb), col("bucket") === col("qbucket"))
      .select(col("vec_id"), cosineExpr("embedding", "qv").as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** L2-normalize: each component / `normCol` (a materialized norm
    * column — don't inline the norm expression, transform would
    * re-evaluate it per element), rounded 4dp. */
  def normalized(embedding: String, normCol: String): Column =
    expr(s"transform($embedding, x -> round(CAST(x AS DOUBLE) / $normCol, 4))")
}
