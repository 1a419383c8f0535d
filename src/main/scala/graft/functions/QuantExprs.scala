package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding columns — the standard
  * memory/IO lever for vector search at corpus scale: a float32
  * embedding row is 4 bytes/dim; its int8 codes are 1 byte/dim, so a
  * quantized corpus scans, shuffles and broadcasts at a quarter of the
  * float cost while cosine ranking degrades only by the quantization
  * error (recall law in `QuantizationSpec`).
  *
  * Scaling is per-vector MAXABS, not L2: maxabs of a float array is
  * computed with comparisons only (no summation), so the codes are
  * bit-reproducible in any engine that does IEEE double arithmetic —
  * the DuckDB oracle recomputes every code exactly. Cosine over codes
  * is scale-invariant, so the maxabs factor cancels and quantized
  * cosine approximates true cosine without ever materializing a norm:
  *
  *   code_i = floor(x_i · levels / maxabs + 0.5)        (exact int)
  *   qcos   = dot(a,b) / sqrt(dot(a,a) · dot(b,b))      (ints → double)
  *
  * All expressions are codegen'd (`defineCodeGen` + static helpers) so
  * the quantize-scan and the scoring join stay inside whole-stage
  * codegen.
  */
object QuantOps {

  /** Per-vector maxabs in double — exact: float→double widening and
    * comparisons introduce no rounding. */
  def maxAbs(v: ArrayData): Double = {
    val n = v.numElements()
    var m = 0d
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > m) m = x
      i += 1
    }
    m
  }

  /** Int codes of a float vector: floor(x·levels/maxabs + 0.5) —
    * round-half-up toward +∞, the formula the SQL oracle writes
    * verbatim. An all-zero vector quantizes to all-zero codes. */
  def quantize(v: ArrayData, levels: Int): ArrayData = {
    val n = v.numElements()
    val m = maxAbs(v)
    val out = new Array[Int](n)
    if (m > 0d) {
      var i = 0
      while (i < n) {
        out(i) = math.floor(
          v.getFloat(i).toDouble * levels.toDouble / m + 0.5).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Pack int codes into one byte each (the actual 4× storage win).
    * Codes from [[quantize]] with levels ≤ 127 always fit; any other
    * input is a caller bug worth failing loudly on, not truncating. */
  def packCodes(codes: ArrayData): Array[Byte] = {
    val n = codes.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = codes.getInt(i)
      if (c < Byte.MinValue || c > Byte.MaxValue)
        throw new IllegalArgumentException(
          s"pack_codes: code $c at index $i does not fit int8 — " +
            "quantize with levels <= 127 before packing")
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** Exact integer dot product of two packed int8 code vectors.
    * |code| ≤ 127 ⇒ each term ≤ 2¹⁴, so Long overflows only past ~2⁴⁹
    * dimensions — unreachable. */
  def dotPacked(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"quantized_dot: code dimensions differ (${a.length} vs ${b.length})")
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }

  /** Quantized cosine from exact integer dots — deterministic across
    * engines (IEEE division and sqrt of exact integers). Zero vectors
    * score 0.0 rather than NaN so they sort below every real match. */
  def qcos(a: Array[Byte], b: Array[Byte]): Double = {
    val ab = dotPacked(a, b)
    val aa = dotPacked(a, a)
    val bb = dotPacked(b, b)
    if (aa == 0L || bb == 0L) 0d
    else ab.toDouble / math.sqrt(aa.toDouble * bb.toDouble)
  }
}

/** Int8 codes (`array<int>`, each in [-levels, levels]) of an
  * `array<float>` embedding — per-vector maxabs scaling. */
case class QuantizeVec(child: Expression, levels: Int)
    extends UnaryExpression {
  require(levels > 0 && levels <= 127,
    s"quantize_vec: need 0 < levels <= 127 (int8 range), got $levels")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    QuantOps.quantize(v.asInstanceOf[ArrayData], levels)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.QuantOps.quantize($v, $levels)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `array<int>` codes → `binary` (one int8 byte per dim) — the compact
  * form a quantized corpus persists, shuffles and broadcasts. */
case class PackCodes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    QuantOps.packCodes(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.QuantOps.packCodes($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Exact integer dot product of two packed code columns. */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    QuantOps.dotPacked(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.QuantOps.dotPacked($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Quantized cosine between two packed code columns — integer dots,
  * then one IEEE division; scale-invariant, so the per-vector maxabs
  * factors cancel. */
case class QuantizedCos(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    QuantOps.qcos(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QuantOps.qcos($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
