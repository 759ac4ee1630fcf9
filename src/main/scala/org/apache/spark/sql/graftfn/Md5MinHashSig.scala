// Lives under org.apache.spark.sql for the private[sql] expression
// plumbing, like Dot4 and MinHashSig.
package org.apache.spark.sql.graftfn

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native evaluation of the PORTABLE (md5-family) MinHash signature —
  * bit-identical to the relational formulation in
  * [[graft.llm.Dedup.minhashSigsPortable]]'s oracle SQL:
  *
  *   lane i of shingle s = conv(substr(md5(concat('⌊i/4⌋:', s)), (i%4)*8+1, 8), 16, 10)
  *   m_i = min over shingles
  *
  * i.e. hash (4j+l) is the l-th big-endian unsigned 32-bit word of
  * MD5("j:" + shingle), minimized per lane over the doc's w-shingles.
  * The SQL form explodes shingles to rows and folds them back through a
  * 32-column min-aggregate — one md5 → hex string → substr → conv parse
  * chain per (shingle, lane). This expression does the identical math in
  * one compiled pass per document on the raw digest bytes (no row
  * explosion, no groupBy shuffle, no hex round-trips); equality of the
  * two forms is asserted in LlmSpec, and the DuckDB oracle still runs
  * the relational form.
  *
  * Returns array<bigint> of the k lane minima; a doc with fewer than
  * `shingleN` words (no shingles) yields Long.MaxValue lanes — callers
  * filter those out before use, matching the SQL `size(w) >= n` guard.
  */
case class Md5MinHashSig(child: Expression, shingleN: Int, k: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k % 4 == 0, s"k=$k must be divisible by 4 (lanes per digest)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"

  // "j:" prefixes, precomputed once per expression instance (immutable)
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k / 4)(j => s"$j:".getBytes(StandardCharsets.UTF_8))

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val nw = words.numElements()
    val nsh = math.max(nw - shingleN + 1, 0)
    val mins = Array.fill(k)(Long.MaxValue)
    if (nsh == 0) return new GenericArrayData(mins)
    val md = MessageDigest.getInstance("MD5")
    // UTF-8 bytes of each word, each converted exactly once
    val wb = new Array[Array[Byte]](nw)
    var i = 0
    while (i < nw) {
      val u = words.getUTF8String(i)
      wb(i) = if (u == null) Array.emptyByteArray else u.getBytes
      i += 1
    }
    val space = ' '.toByte
    i = 0
    while (i < nsh) {
      // shingle bytes = words[i..i+n) joined by ' ' (concat_ws semantics:
      // split() never yields NULL elements, empties are preserved)
      var len = shingleN - 1
      var j = 0
      while (j < shingleN) { len += wb(i + j).length; j += 1 }
      val sb = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < shingleN) {
        val w = wb(i + j)
        System.arraycopy(w, 0, sb, off, w.length)
        off += w.length
        if (j < shingleN - 1) { sb(off) = space; off += 1 }
        j += 1
      }
      var p = 0
      while (p < k / 4) {
        md.update(prefixes(p))
        md.update(sb)
        val d = md.digest() // resets for the next update
        var l = 0
        while (l < 4) {
          val lane = ((d(4 * l) & 0xffL) << 24) | ((d(4 * l + 1) & 0xffL) << 16) |
            ((d(4 * l + 2) & 0xffL) << 8) | (d(4 * l + 3) & 0xffL)
          val idx = 4 * p + l
          if (lane < mins(idx)) mins(idx) = lane
          l += 1
        }
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
}

object Md5MinHashSig {
  def of(words: Column, shingleN: Int, k: Int): Column =
    ExpressionUtils.column(Md5MinHashSig(ExpressionUtils.expression(words), shingleN, k))
}
