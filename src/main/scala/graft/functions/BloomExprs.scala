package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bloom-filter probe math shared by the BUILD side (the distributed
  * bitmap aggregation in [[graft.operators.Curation.contaminatedDocsBloom]])
  * and the MEMBERSHIP side ([[BloomMightContain]]): both must derive the
  * exact same k probe positions from a 64-bit element hash or membership
  * silently breaks (false NEGATIVES — the one error class a Bloom filter
  * must never produce).
  *
  * Standard double hashing (Kirsch–Mitzenstein): position i =
  * (h + i·h2) mod m, with h2 an odd mix of h (odd so the probe sequence
  * cycles through the whole power-of-two table) and m a power of two so
  * the mod is a mask.
  */
object BloomOps {

  /** Murmur3 fmix64 finalizer of `h`, forced odd. */
  def mixOdd(h: Long): Long = {
    var z = h
    z ^= (z >>> 33); z *= 0xff51afd7ed558ccdL
    z ^= (z >>> 33); z *= 0xc4ceb9fe1a85ec53L
    z ^= (z >>> 33)
    z | 1L
  }

  /** The k probe positions of `h` in an `mBits`-bit table (mBits a power
    * of two — masked, not modded). */
  def positions(h: Long, k: Int, mBits: Int): ArrayData = {
    val h2 = mixOdd(h)
    val mask = (mBits - 1).toLong
    val out = new Array[Int](k)
    var i = 0
    while (i < k) {
      out(i) = ((h + i * h2) & mask).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Membership probe against a bitmap of 64-bit words (m = 64·words,
    * words a power of two — checked loudly: a mis-sized bitmap would
    * otherwise probe different positions than the build side set). */
  def mightContain(h: Long, bitmap: ArrayData, k: Int): Boolean = {
    val words = bitmap.numElements()
    if (words <= 0 || (words & (words - 1)) != 0)
      throw new IllegalArgumentException(
        s"bloom_might_contain: bitmap has $words words — must be a " +
          "positive power of two (build with Curation.buildBloomBitmap)")
    val mask = words.toLong * 64L - 1L
    val h2 = mixOdd(h)
    var i = 0
    while (i < k) {
      // Long indexing throughout: the registered SQL form accepts ANY
      // array<bigint>, and for words > 2^25 the bit mask exceeds
      // Int.MaxValue — an Int cast here would wrap positions negative
      // and probe garbage instead of failing. The word index is always
      // < words (an Int: array sizes are), so only the final cast is
      // narrowing and it is provably in range.
      val pos = (h + i * h2) & mask
      if (((bitmap.getLong((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 0L)
        return false
      i += 1
    }
    true
  }
}

/** `array<int>` of the k Bloom probe positions of a `bigint` hash — the
  * build-side half of the filter: explode + distinct + word-wise bit_or
  * turns a hash column into the bitmap without ever collecting the
  * hashes themselves. */
case class BloomPositions(child: Expression, k: Int, mBits: Int)
    extends UnaryExpression {
  require(k > 0, s"bloom_positions: k must be positive, got $k")
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"bloom_positions: mBits must be a power of two >= 64, got $mBits")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_positions requires a bigint hash input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(h: Any): Any =
    BloomOps.positions(h.asInstanceOf[Long], k, mBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomOps.positions($c, $k, $mBits)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Membership of a `bigint` hash in a Bloom bitmap (`array<bigint>` of
  * words, usually a broadcast literal): the scan-side prefilter that
  * keeps non-members from ever reaching a join. False positives are
  * possible by construction (callers follow with an exact confirm);
  * false negatives are not. */
case class BloomMightContain(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k > 0, s"bloom_might_contain: k must be positive, got $k")
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires (bigint hash, array<bigint> bitmap), " +
          s"got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = BooleanType
  override def nullSafeEval(h: Any, bm: Any): Any =
    BloomOps.mightContain(h.asInstanceOf[Long], bm.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, bm) => s"graft.functions.BloomOps.mightContain($h, $bm, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
