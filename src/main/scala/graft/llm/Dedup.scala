package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §2.K).
  *
  * Scale design: every variant reduces to hash-partitioned groupBy/join on
  * a derived key — exact dedup groups on a content hash; MinHash-LSH
  * groups on band keys so only same-bucket candidates are ever paired
  * (never an all-pairs product); SimHash gives a constant-size signature
  * comparable by Hamming distance. All signatures are computed with
  * codegen'd Column expressions (xxhash64 + higher-order array functions);
  * no UDFs and no driver-side loops.
  */
object Dedup {

  /** Lower-cased whitespace tokens of a text column. */
  def words(text: Column): Column = split(lower(text), " ")

  /** w-shingles (word n-grams) as strings: shingle i = words[i..i+n).
    * `arr` is a SQL fragment (pass a materialized column name). */
  def shingles(arr: String, n: Int): Column =
    expr(s"transform(sequence(0, greatest(size($arr) - $n, 0)), i -> concat_ws(' ', slice($arr, i + 1, $n)))")

  /** MinHash signature: for each of `k` fixed seeds, the minimum xxhash64
    * over the shingle set. One array column of k BIGINTs. */
  def minhashSignature(arr: String, k: Int): Column =
    expr(s"transform(sequence(0, ${k - 1}), j -> array_min(transform($arr, s -> xxhash64(s, j))))")

  /** LSH band keys: split the k-length signature into bands of `r` rows;
    * band key = hash of the band slice (+ band index). Rows sharing any
    * band key are near-dup candidates. */
  def bandKeys(arr: String, k: Int, r: Int): Column = {
    val bands = k / r
    expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(concat_ws(',', slice($arr, b * $r + 1, $r)), b))")
  }

  /** SimHash over tokens: bit i of the signature is set iff the sum of
    * (+1/-1 for bit i of xxhash64(token)) over all tokens is positive.
    * `bits` ≤ 32. Computed as one aggregate HOF with an int-array
    * accumulator — single pass over the tokens. */
  def simhash(arr: String, bits: Int): Column = {
    val acc = s"aggregate($arr, transform(sequence(1, $bits), i -> 0L), " +
      s"(acc, w) -> zip_with(acc, transform(sequence(0, ${bits - 1}), " +
      s"i -> IF((shiftright(xxhash64(w), i) & 1L) = 1L, 1L, -1L)), (a, b) -> a + b))"
    expr(s"aggregate(zip_with($acc, sequence(0, ${bits - 1}), " +
      s"(s, i) -> IF(s > 0L, shiftleft(1L, cast(i as int)), 0L)), 0L, (a, b) -> a + b)")
  }

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity between two word-set columns (arrays). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    round(inter / uni, 4)
  }

  /** MinHash-LSH near-duplicate candidate pairs, verified by exact
    * Jaccard. Pipeline: signature → explode band keys → self-join per
    * bucket (a.id < b.id) → dedup pairs → exact-verify ≥ threshold.
    * The join key is (band index, band hash), so the shuffle distributes
    * over buckets; bucket sizes are bounded by collision probability,
    * not corpus size. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 32, r: Int = 4, shingleN: Int = 3,
                   threshold: Double = 0.7): DataFrame = {
    val sig = docs.select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .withColumn("sh", shingles("w", shingleN))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature("sh", k))
      .withColumn("band", explode(bandKeys("sig", k, r)))
    val a = sig.select(col("band"), col("id").as("a_id"), col("w").as("a_w"))
    val b = sig.select(col("band"), col("id").as("b_id"), col("w").as("b_w"))
    a.join(b, Seq("band"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_w", "b_w").distinct()
      .withColumn("jaccard", jaccard(array_distinct(col("a_w")), array_distinct(col("b_w"))))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
      .orderBy("a_id", "b_id")
  }
}
