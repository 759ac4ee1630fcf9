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

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val n = text.numChars()
    val ng = n - k + 1            // gram count
    val nwin = ng - w + 1         // full windows
    if (nwin <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](ng)
    var j = 0
    while (j < ng) {
      // SQL substr counts CHARACTERS; substring(i, j) is code-point based
      digests(j) = md.digest(text.substring(j, j + k).getBytes)
      j += 1
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
      while (tail > head && !less(digests(deque(tail - 1)), digests(j))) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1 && deque(head) != lastEmitted) {
        lastEmitted = deque(head)
        val d = digests(lastEmitted)
        val hex = new java.lang.StringBuilder(32)
        var b = 0
        while (b < 16) {
          hex.append(Character.forDigit((d(b) >> 4) & 0xf, 16))
          hex.append(Character.forDigit(d(b) & 0xf, 16))
          b += 1
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
