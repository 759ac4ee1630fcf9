// Lives under org.apache.spark.sql for the private[sql] expression
// plumbing, like Dot4.
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native MinHash signature over a token array (SURVEY §4.2 hot-path
  * contingency, used by the near-dup LSH pipeline).
  *
  * Per row: hash each token once (xxHash64 of its bytes), form word
  * n-gram ("shingle") hashes by chaining the member token hashes, then
  * for each of `k` fixed seeds take the minimum of xxHash64(shingleHash,
  * seed). One compiled pass, zero per-element object allocation.
  *
  * The higher-order-function formulation of the same signature
  * ([[graft.llm.Dedup.minhashSignature]]) evaluates its lambda
  * interpreted per element (HOFs are outside whole-stage codegen) — at
  * 5k docs × ~300 shingles × 32 seeds that interpretation dominated the
  * whole near-dup pipeline. Signature VALUES differ from the HOF form
  * (different shingle-hash domain); both are valid MinHash families and
  * the operator is property-tested, not oracle-compared.
  */
case class MinHashSig(child: Expression, shingleN: Int, k: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nw = words.numElements()
    val nsh = math.max(nw - shingleN + 1, 0)
    val mins = Array.fill(k)(Long.MaxValue)
    if (nsh == 0) return new GenericArrayData(mins)
    // token hashes, each string hashed exactly once
    val wh = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      val u = words.getUTF8String(i)
      wh(i) = if (u == null) 0L else XXH64.hashUTF8String(u, 42L)
      i += 1
    }
    i = 0
    while (i < nsh) {
      // shingle hash: chain the n member token hashes
      var h = 42L
      var j = 0
      while (j < shingleN) { h = XXH64.hashLong(wh(i + j), h); j += 1 }
      // fold into the k per-seed minima
      var s = 0
      while (s < k) {
        val hs = XXH64.hashLong(h, s.toLong)
        if (hs < mins(s)) mins(s) = hs
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def of(words: Column, shingleN: Int, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(words), shingleN, k))
}
