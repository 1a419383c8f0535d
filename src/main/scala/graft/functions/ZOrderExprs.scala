package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve key for two-dimensional data layout.
  *
  * A 100 TB table laid out by ONE sort column skips files only for
  * predicates on that column; a box predicate on a second dimension
  * scans everything. Interleaving the bits of two bucketized columns
  * gives a single sort key whose ranges are 2-D-local: sorting and
  * range-sharding by it clusters BOTH dimensions, so per-file min/max
  * statistics (and the shard manifest) prune on either — the standard
  * multi-dimensional clustering trick (z-ordering) built from one
  * codegen'd expression plus the existing [[graft.sources.Sinks
  * .writeRangeShards]] machinery. The skipping law (a box query
  * overlaps ~√F of F z-ordered files vs ALL files of a one-column
  * layout filtered on the other dimension) is pinned in `ZOrderSpec`.
  *
  * Inputs are clamped to [0, 2^bits) — callers bucketize arbitrary
  * domains first (e.g. epoch-day, id mod 2^bits); clamping (not error)
  * keeps dirty outliers in the layout's edge cells instead of failing
  * a 10⁵-task write. Integer-only, so the SQL oracle reproduces every
  * key exactly with shift/mask arithmetic.
  */
object ZOrderOps {

  /** Interleave the low `bits` bits: result bit 2i = x's bit i, bit
    * 2i+1 = y's bit i. Monotone in each argument with the other fixed. */
  def interleave2(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    val cx = math.min(math.max(x, 0L), mask)
    val cy = math.min(math.max(y, 0L), mask)
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((cx >> i) & 1L) << (2 * i)
      z |= ((cy >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Morton key of two long columns (`bits` bits each, clamped). */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31,
    s"z_order2: need 0 < bits <= 31 (2*bits result bits in a long), got $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderOps.interleave2(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZOrderOps.interleave2($x, $y, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
