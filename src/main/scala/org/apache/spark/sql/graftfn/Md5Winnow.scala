// Lives under org.apache.spark.sql for the private[sql] expression
// plumbing, like Dot4 / MinHashSig / Md5MinHashSig.
package org.apache.spark.sql.graftfn

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluation of the md5 winnowing fingerprint — bit-identical to
  * the relational formulation the DuckDB oracle runs (llm_fingerprint):
  *
  *   grams:   h_j = md5(substr(text, j, k))        for j in 1..numChars-k+1
  *   windows: min(h_j..h_{j+w-1})                  full windows only
  *   output:  DISTINCT window minima as lowercase hex
  *
  * The SQL shape explodes one row per character position (md5 → hex →
  * 16-wide sliding min via a window function, O(n·w) string compares
  * after a per-doc sort). This expression does the identical math in one
  * pass per document: substring by CODE POINTS like SQL substr (UTF8String
  * .substringSQL), digests compared as unsigned bytes (lexicographic
  * order of the lowercase hex rendering equals unsigned byte order), and
  * the sliding minimum via a monotonic deque — O(n) per doc, no row
  * explosion, no per-doc sort shuffle. Equality with the SQL form is
  * asserted over the real fixture corpus in LlmSpec.
  *
  * Returns the SORTED array of distinct window-min hex digests (callers
  * explode it; the canonical order makes the result deterministic under
  * any partitioning). Texts with no full window yield an empty array.
  */
case class Md5Winnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1 && w >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_winnow"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val n = text.numChars()
    val ng = n - k + 1            // gram count
    val nwin = ng - w + 1         // full windows
    if (nwin <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    // r18 (guide §1.2 step 2 — per-task work): the former per-gram
    // `text.substring(j, j+k).getBytes` paid two byte-array copies plus
    // a fresh 16-byte digest allocation per gram (~n per doc, ~10M per
    // sf0.1 pass). One code-point→byte-offset index per doc makes each
    // gram a (offset, len) slice of ONE materialized byte array, fed to
    // the digest in place; digests land in a reused scratch buffer and
    // are stored as two packed longs (unsigned-long compare ≡ the
    // former unsigned-byte compare ≡ lowercase-hex order). Identical
    // output bytes — only allocations and copies are removed.
    val bytes = text.getBytes      // one copy per doc
    val offs = new Array[Int](n + 1)
    var bi = 0
    var ci = 0
    while (ci < n) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(n) = bytes.length
    val hi = new Array[Long](ng)
    val lo = new Array[Long](ng)
    val scratch = new Array[Byte](16)
    def pack8(off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (scratch(off + i) & 0xffL); i += 1 }
      v
    }
    var j = 0
    while (j < ng) {
      md.update(bytes, offs(j), offs(j + k) - offs(j))
      md.digest(scratch, 0, 16)   // resets md for the next gram
      hi(j) = pack8(0)
      lo(j) = pack8(8)
      j += 1
    }
    // unsigned 128-bit compare over the packed digests
    def less(a: Int, b: Int): Boolean = {
      val c = java.lang.Long.compareUnsigned(hi(a), hi(b))
      if (c != 0) c < 0 else java.lang.Long.compareUnsigned(lo(a), lo(b)) < 0
    }
    // monotonic deque sliding min (indices of candidate minima, increasing)
    val deque = new Array[Int](ng)
    var head = 0; var tail = 0 // [head, tail)
    val out = new java.util.TreeSet[String]()
    // classic winnowing emit rule: consecutive windows usually share the
    // same minimum INDEX — render/insert only when the head index moves
    // (equal digests at different indices still dedup via the TreeSet),
    // turning O(n) hex renders into O(distinct minima)
    var lastEmitted = -1
    j = 0
    while (j < ng) {
      while (tail > head && !less(deque(tail - 1), j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1 && deque(head) != lastEmitted) {
        lastEmitted = deque(head)
        val hex = new java.lang.StringBuilder(32)
        var nib = 60
        while (nib >= 0) {
          hex.append(Character.forDigit(((hi(lastEmitted) >>> nib) & 0xfL).toInt, 16))
          nib -= 4
        }
        nib = 60
        while (nib >= 0) {
          hex.append(Character.forDigit(((lo(lastEmitted) >>> nib) & 0xfL).toInt, 16))
          nib -= 4
        }
        out.add(hex.toString)
      }
      j += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Winnow =
    copy(child = newChild)
}

object Md5Winnow {
  def of(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(Md5Winnow(ExpressionUtils.expression(text), k, w))
}
