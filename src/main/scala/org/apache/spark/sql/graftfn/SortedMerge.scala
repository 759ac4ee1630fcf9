// Lives under org.apache.spark.sql for the private[sql] expression
// plumbing, like Dot4.
package org.apache.spark.sql.graftfn

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native sorted-merge intersection count of two ASCENDING-SORTED
  * ARRAY<BIGINT> columns: the number of DISTINCT values present in both
  * (exactly `size(array_intersect(a, b))` for sorted inputs).
  *
  * Why a custom expression (SURVEY §4.2 hot-path contingency; VERDICT
  * r14 next-round #8): the graph wedge family (triangles, clustering
  * coefficient, neighbor Jaccard, Adamic–Adar) intersects PRE-SORTED
  * adjacency arrays on every candidate edge — the hottest per-row loop
  * in the repo after the dot product. Spark's `array_intersect` builds a
  * per-row hash set of one side and probes the other (allocation +
  * hashing per element; the exact kernel the r14 container drift
  * disclosure measured at 1.7–2.1×); for sorted inputs a two-pointer
  * merge is O(|a|+|b|) with ZERO allocation and no hashing, and lives
  * inside whole-stage codegen.
  *
  * PRECONDITION (callers': every call site builds its inputs with
  * `sort_array(collect_list(...))`): both arrays ascending-sorted with
  * no NULL elements. Duplicate values are counted once (the merge skips
  * equal runs on both sides), matching array_intersect's distinct
  * semantics. Unsorted input silently undercounts — this expression is
  * deliberately not registered for ad-hoc SQL.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  /** Same Janino trap as [[Dot4.nullable]]: a non-nullable input would
    * codegen `ev.isNull` as the literal `false` and any generated
    * assignment to it fails compilation, silently dropping the whole
    * stage out of codegen. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var cnt = 0L
    while (i < n && j < m) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u < v) i += 1
      else if (u > v) j += 1
      else {
        cnt += 1
        i += 1; j += 1
        while (i < n && x.getLong(i) == u) i += 1
        while (j < m && y.getLong(j) == v) j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      val cnt = ctx.freshName("cnt")
      s"""
        int $n = $a.numElements(); int $m = $b.numElements();
        int $i = 0; int $j = 0; long $cnt = 0L;
        while ($i < $n && $j < $m) {
          long $u = $a.getLong($i); long $v = $b.getLong($j);
          if ($u < $v) { $i++; }
          else if ($u > $v) { $j++; }
          else {
            $cnt++;
            $i++; $j++;
            while ($i < $n && $a.getLong($i) == $u) { $i++; }
            while ($j < $m && $b.getLong($j) == $v) { $j++; }
          }
        }
        ${ev.value} = $cnt;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def of(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Shared weight kernel for [[AdamicAdarWedge]]: 1/ln(deg) quantized to
  * DECIMAL scale 10 exactly the way Spark's `Cast(double →
  * DECIMAL(28,10))` does it — `java.math.BigDecimal.valueOf` (shortest
  * decimal representation of the double) then HALF_UP at the 10th
  * fractional digit — returned as the scaled unscaled-long. Bit-equal
  * per-term to the `dec10(lit(1.0)/log(deg))` Column formulation, so the
  * fused merge sum equals the explode/aggregate sum for ANY order and
  * split. Degrees are small integers repeated across millions of wedges:
  * a lock-free benign-race cache (idempotent writes of the same value)
  * keeps the BigDecimal path off the hot loop. deg ≤ 1 (1/ln → ∞/NaN,
  * which the Column cast turns into NULL that SUM skips) contributes 0,
  * mirroring the decimal formulation; it cannot occur for common
  * neighbors of an adjacent pair (deg ≥ 2 by construction). */
object AaKernel {
  // AtomicLongArray rather than Array[Long]: the JMM permits word
  // tearing on racy non-volatile 64-bit reads, and executor task
  // threads share this cache. get/lazySet keep the same lock-free
  // idempotent-write scheme (every writer stores the same value for a
  // slot) with no tearing and no fence on the read path's hot hit.
  private val Cache = new java.util.concurrent.atomic.AtomicLongArray(1 << 16)

  def recip10(deg: Long): Long = {
    if (deg <= 1L) return 0L
    if (deg < (1 << 16)) {
      val c = Cache.get(deg.toInt)
      if (c != 0L) c
      else { val v = compute(deg); Cache.lazySet(deg.toInt, v); v }
    } else compute(deg)
  }

  private def compute(deg: Long): Long =
    java.math.BigDecimal.valueOf(1.0 / math.log(deg.toDouble))
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
}

/** Fused Adamic–Adar wedge kernel over two ascending-sorted arrays of
  * DEGREE-PACKED neighbor longs (`nbr << shift | deg`, the
  * [[graft.rel.Graph]] copart packing): one merge pass returns
  * `struct(nc BIGINT, ws DECIMAL(38,10))` — the distinct common-neighbor
  * count and the exact Σ 1/ln(deg) over them (per-term quantization via
  * [[AaKernel.recip10]], summed as scaled longs: order-independent
  * integer adds, identical to summing the DECIMAL(28,10) casts).
  *
  * This replaces the explode + broadcast-degree join + (src,dst)
  * re-aggregate of the pre-r15 plans with a pure map-side expression:
  * nothing wedge-sized is ever materialized — not even as aggregate
  * input — and the per-neighbor weight decodes from the packed low bits
  * (`pk & mask`). Equality on the packed long ≡ equality on nbr (deg is
  * a function of nbr), so the merge intersects neighbor sets exactly.
  *
  * Overflow bound: each term ≤ 1/ln 2 · 10¹⁰ ≈ 1.45e10, so the scaled
  * sum stays inside a long for < 6.4e8 common neighbors per pair —
  * beyond any physical degree this engine targets.
  *
  * Same sortedness/no-null-element precondition as
  * [[SortedIntersectCount]].
  */
case class AdamicAdarWedge(left: Expression, right: Expression, mask: Long)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("nc", LongType, nullable = false),
    StructField("ws", DecimalType(38, 10), nullable = false)))
  override def prettyName: String = "adamic_adar_wedge"

  /** See [[SortedIntersectCount.nullable]]. */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var cnt = 0L; var acc = 0L
    while (i < n && j < m) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u < v) i += 1
      else if (u > v) j += 1
      else {
        cnt += 1
        acc += AaKernel.recip10(u & mask)
        i += 1; j += 1
        while (i < n && x.getLong(i) == u) i += 1
        while (j < m && y.getLong(j) == v) j += 1
      }
    }
    new GenericInternalRow(Array[Any](cnt, Decimal(acc, 38, 10)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      val cnt = ctx.freshName("cnt"); val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements(); int $m = $b.numElements();
        int $i = 0; int $j = 0; long $cnt = 0L; long $acc = 0L;
        while ($i < $n && $j < $m) {
          long $u = $a.getLong($i); long $v = $b.getLong($j);
          if ($u < $v) { $i++; }
          else if ($u > $v) { $j++; }
          else {
            $cnt++;
            $acc += org.apache.spark.sql.graftfn.AaKernel.recip10($u & ${mask}L);
            $i++; $j++;
            while ($i < $n && $a.getLong($i) == $u) { $i++; }
            while ($j < $m && $b.getLong($j) == $v) { $j++; }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{
            java.lang.Long.valueOf($cnt),
            org.apache.spark.sql.types.Decimal.apply($acc, 38, 10)});
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdamicAdarWedge =
    copy(left = newLeft, right = newRight)
}

object AdamicAdarWedge {
  def of(a: Column, b: Column, mask: Long): Column =
    ExpressionUtils.column(AdamicAdarWedge(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), mask))
}
