package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the signature/similarity hot paths.
  *
  * The same semantics are expressible with higher-order built-ins
  * (`transform`/`aggregate`/`zip_with`), but those evaluate interpreted
  * lambdas with per-element boxing — profiled at ~10s for the MinHash
  * signature pass at sf0.1. These expressions run tight primitive loops
  * (and `CosineSim` participates in whole-stage codegen via a static
  * helper call), while computing BIT-IDENTICAL results to the SQL
  * oracles: same hash constants, same sequential double summation.
  */
object VectorOps {

  /** cosine(a, b) = dot/sqrt(|a|²·|b|²), float inputs, double math,
    * sequential accumulation (oracle-identical). Dimensions must match:
    * UnsafeArrayData.getFloat is unchecked, so an unguarded loop over
    * mismatched rows would read garbage memory instead of failing. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_sim: embedding dimensions differ (${n} vs ${b.numElements()})")
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Sign-LSH bucket: bit j = sign of Σ_i v(i) · w(i,j) with the fixed
    * integer lattice w(i,j) = ((i·31 + j·17) % 7) − 3 (0-based i). */
  def signLshBucket(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var acc = 0d
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * (((i * 31 + j * 17) % 7) - 3).toDouble
        i += 1
      }
      if (acc >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Hyperplane weight for the BANDED sign-LSH family: w(i,j) =
    * (((i+1)·(j+1)·7919 + i·31 + j·17) mod 1009) − 504 (0-based dim i,
    * 0-based plane j). The [[signLshBucket]] lattice has period 7 in j
    * (j·17 ≡ j·3 mod 7), so it tops out at 7 distinct hyperplanes —
    * useless for banding. This family's modulus is the prime 1009 with
    * an i·j cross term, so planes stay distinct out to j ≈ 1009 and
    * adjacent bands are uncorrelated. All operands are non-negative
    * before the mod, so Scala `%` and SQL `%` agree exactly. */
  def bandWeight(i: Int, j: Int): Long =
    ((i + 1L) * (j + 1L) * 7919L + i * 31L + j * 17L) % 1009L - 504L

  /** Banded sign-LSH keys: `bands` longs, band b's bit r = sign of
    * Σ_i v(i) · w(i, b·rowBits + r) over the [[bandWeight]] lattice.
    * A pair is a near-dup candidate iff SOME band matches exactly —
    * the MinHash-banding recall/precision trade for vectors: rowBits
    * sets bucket granularity (and so occupancy), bands buys recall
    * back. */
  def signLshBands(v: ArrayData, bands: Int, rowBits: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rowBits) {
        val j = b * rowBits + r
        var acc = 0d
        var i = 0
        while (i < n) {
          acc += v.getFloat(i).toDouble * bandWeight(i, j).toDouble
          i += 1
        }
        if (acc >= 0) key |= (1L << r)
        r += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Exact cosine similarity between two `array<float>` columns. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Sign-LSH bucket id (`bits` hyperplane signs) of an `array<float>`. */
case class SignLshBucket(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorOps.signLshBucket(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorOps.signLshBucket($v, $bits)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Banded sign-LSH keys (`bands` × `rowBits` hyperplanes from the
  * [[VectorOps.bandWeight]] lattice) of an `array<float>` — the blocking
  * key family for [[graft.operators.Similarity.embeddingPairs]]. */
case class SignLshBands(child: Expression, bands: Int, rowBits: Int)
    extends UnaryExpression {
  require(bands > 0 && rowBits > 0 && rowBits <= 62,
    s"sign_lsh_bands: need bands > 0 and 0 < rowBits <= 62, " +
      s"got bands=$bands rowBits=$rowBits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorOps.signLshBands(v.asInstanceOf[ArrayData], bands, rowBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VectorOps.signLshBands($v, $bands, $rowBits)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature of an `array<bigint>` feature-hash set: element j is
  * min over features of (a(j)·h + b(j)) mod P — identical constants to
  * `graft.operators.Dedup` and the DuckDB oracle. */
case class MinHashSig(child: Expression, numHashes: Int,
                      aCoef: Long, bCoef: Long, aBase: Long, bBase: Long,
                      p: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = aCoef * j + aBase
      val b = bCoef * j + bBase
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val x = (a * hs.getLong(i) + b) % p
        if (x < mn) mn = x
        i += 1
      }
      out(j) = mn
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 32-bit SimHash of an `array<bigint>` feature-hash set: bit j set iff
  * strictly more features have bit j set than clear. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    SimHash32.compute(hs)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.SimHash32.compute($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SimHash32 {
  def compute(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Distinct hashed word n-gram shingles of a text column, in one pass:
  * whitespace tokenize → n-gram shingles → 32-bit md5-prefix hash →
  * distinct. Semantics match the composed built-ins
  * (`split`/`transform`/`md5`/`conv`) and the DuckDB oracle
  * (`('0x' || substr(md5(s),1,8))::BIGINT`) exactly — but those evaluate
  * interpreted lambdas, and Catalyst's alias substitution (e.g. a
  * downstream `filter(size(hs) > 0)`) re-evaluates the whole chain per
  * reference: profiled ~8s vs <1s at sf0.1. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.ShingleHashes.compute($v, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object ShingleHashes {
  private val md = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val digest = md.get()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      digest.reset()
      val d = digest.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars of md5 = first 4 digest bytes, big-endian
      val h = ((d(0) & 255L) << 24) | ((d(1) & 255L) << 16) |
        ((d(2) & 255L) << 8) | (d(3) & 255L)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Sum of Unicode codepoints of a string — the feature-extraction
  * stand-in used by the multimodal metadata query. Equals the composed
  * `aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t,
  * i, 1))), ...)` form (and DuckDB's ascii/substr loop) but in one
  * primitive pass instead of an interpreted per-character lambda chain. */
case class CharSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    CharSum.compute(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.CharSum.compute($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object CharSum {
  def compute(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val str = s.toString
    var sum = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sum += cp
      i += Character.charCount(cp)
    }
    sum
  }
}

/** Minimum polynomial rolling hash over all k-codepoint windows of a
  * string (Rabin–Karp, base B mod M): a compact content fingerprint
  * robust to document reordering at the window level. O(n) via the
  * rolling update; equals the per-window polynomial the SQL oracle
  * computes directly. Returns null for strings shorter than k. */
case class RollingMinHash(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    RollingMinHash.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val value = ctx.freshName("rmh")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Long $value = graft.functions.RollingMinHash.compute($c, $k);
         |if ($value == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $value.longValue(); }
       """.stripMargin
    })
  }
}

object RollingMinHash {
  val B = 257L
  val M = 2147483647L

  def compute(s: org.apache.spark.unsafe.types.UTF8String, k: Int): java.lang.Long = {
    val str = s.toString
    val cps = str.codePoints().toArray
    if (cps.length < k) return null
    var bk1 = 1L // B^(k-1) mod M
    var i = 0
    while (i < k - 1) { bk1 = bk1 * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    var mn = h
    i = k
    while (i < cps.length) {
      h = (((h - cps(i - k) * bk1 % M + M) % M) * B + cps(i)) % M
      if (h < mn) mn = h
      i += 1
    }
    java.lang.Long.valueOf(mn)
  }
}

/** Jaccard similarity of two `array<bigint>` columns, defined exactly as
  * the composed form
  * `size(array_intersect(a,b)) / (size(a) + size(b) - size(array_intersect(a,b)))`
  * for ALL inputs: the intersection count is over DISTINCT common values
  * (array_intersect semantics) while the sizes count duplicates. One
  * primitive pass — sorted copies + linear merge skipping duplicate runs
  * — instead of the composition, which Catalyst inlines (and therefore
  * re-evaluates) into both the join condition and the output projection,
  * allocating a GenericArrayData per evaluation. Division in double over
  * exactly-representable integer counts: bit-identical to the SQL
  * oracle's `li / CAST(lu - li AS DOUBLE)`. Null array ELEMENTS are not
  * supported and fail loudly at eval time (the schema alone can't prove
  * their absence — `containsNull = true` is pervasive on literals). */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  // array<bigint> ONLY: toLongArray on an array<int>/array<float> would
  // reinterpret 4-byte elements as longs and return silently wrong
  // similarities — mismatches must fail at analysis time instead
  // (AbstractDataType is private[sql], so this checks directly rather
  // than via ExpectsInputTypes)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim requires array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardSim.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Count of DISTINCT common values between two `array<bigint>` columns
  * — the integer numerator the containment verifier divides by the
  * smaller set size. Same one-pass sorted-merge as [[JaccardSim]] (the
  * composed `size(array_intersect(..))` allocates a GenericArrayData
  * per evaluation and gets re-evaluated by the pushed-down filter —
  * measured 4×+ on the >1M-pair candidate stream). */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"intersect_count requires array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.IntersectCount.compute($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object IntersectCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    val xs = JaccardSim.toLongsStrict(a, "intersect_count")
    val ys = JaccardSim.toLongsStrict(b, "intersect_count")
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = xs(i); val y = ys(j)
      if (x == y) {
        c += 1 // count the value once, like array_intersect
        val v = x
        while (i < na && xs(i) == v) i += 1
        while (j < nb && ys(j) == v) j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

object JaccardSim {
  /** `toLongArray` with a loud failure on null elements: the schema may
    * say `containsNull = true` (SQL literals, post-join nullability) and
    * `ArrayData.toLongArray` silently reads a null slot as 0 — the same
    * silent-wrong-answer class the array<bigint> type check exists for. */
  private[functions] def toLongsStrict(a: ArrayData, fn: String): Array[Long] = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: null array element at position $i — null elements are not " +
          "supported; filter(x -> x is not null) the input first")
      i += 1
    }
    a.toLongArray()
  }

  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return Double.NaN // 0/0, as the composed form
    val xs = toLongsStrict(a, "jaccard_sim")
    val ys = toLongsStrict(b, "jaccard_sim")
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = xs(i); val y = ys(j)
      if (x == y) {
        c += 1 // count the VALUE once, however many copies each side has
        while (i < na && xs(i) == x) i += 1
        while (j < nb && ys(j) == x) j += 1
      }
      else if (x < y) i += 1
      else j += 1
    }
    c.toDouble / (na + nb - c).toDouble
  }
}

/** Index (1-based) of the last element of a sorted `array<bigint>` that
  * is ≤ the probe value; 0 when none. The binary-search core of the
  * packed-timeline as-of join ([[graft.operators.TimeOps]]). */
case class SortedLastLE(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(arr: Any, t: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    SortedLastLE.search(a, t.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, t) => s"graft.functions.SortedLastLE.search($a, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object SortedLastLE {
  def search(a: ArrayData, t: Long): Int = {
    var lo = 0
    var hi = a.numElements() // exclusive
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) <= t) lo = mid + 1 else hi = mid
    }
    lo // count of elements <= t == 1-based index of the last one
  }
}

/** Positional decimation of a binary payload to `n` sampled bytes
  * (`binary_sample_bytes`) as a codegen'd expression instead of a typed
  * `Dataset.map` (which deserialized the whole row per record). Shares
  * `Multimodal.decimateBytes` for the exact semantics: payloads ≤ n
  * bytes pass through, else output byte k = input byte (k·len)/n. A
  * byte-level sample for fingerprinting/size-capping — NOT an image
  * resize; the decoding resize is the `mm_resize` codec path. */
case class BinarySampleBytes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"binary_sample_bytes: n must be positive, got $n")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    graft.operators.Multimodal.decimateBytes(v.asInstanceOf[Array[Byte]], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.operators.Multimodal.decimateBytes($c, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-level entry points (Spark 4: Column ⇄ catalyst Expression via
  * `org.apache.spark.sql.classic.ExpressionUtils`). */
object exprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))
  def sign_lsh_bucket(c: Column, bits: Int): Column =
    column(SignLshBucket(expression(c), bits))
  def sign_lsh_bands(c: Column, bands: Int, rowBits: Int): Column =
    column(SignLshBands(expression(c), bands, rowBits))
  def minhash_sig(c: Column, numHashes: Int, aCoef: Long, bCoef: Long,
                  aBase: Long, bBase: Long, p: Long): Column =
    column(MinHashSig(expression(c), numHashes, aCoef, bCoef, aBase, bBase, p))
  def simhash32(c: Column): Column = column(SimHash32(expression(c)))
  def jaccard_sim(a: Column, b: Column): Column =
    column(JaccardSim(expression(a), expression(b)))
  def shingle_hashes(c: Column, n: Int): Column =
    column(ShingleHashes(expression(c), n))
  def char_sum(c: Column): Column = column(CharSum(expression(c)))
  def rolling_min_hash(c: Column, k: Int): Column =
    column(RollingMinHash(expression(c), k))
  def sorted_last_le(arr: Column, t: Column): Column =
    column(SortedLastLE(expression(arr), expression(t)))
  def binary_sample_bytes(c: Column, n: Int): Column =
    column(BinarySampleBytes(expression(c), n))
  def intersect_count(a: Column, b: Column): Column =
    column(IntersectCount(expression(a), expression(b)))
  def bloom_positions(h: Column, k: Int, mBits: Int): Column =
    column(BloomPositions(expression(h), k, mBits))
  def bloom_might_contain(h: Column, bitmap: Column, k: Int): Column =
    column(BloomMightContain(expression(h), expression(bitmap), k))
  def quantize_vec(c: Column, levels: Int): Column =
    column(QuantizeVec(expression(c), levels))
  def pack_codes(c: Column): Column = column(PackCodes(expression(c)))
  def quantized_dot(a: Column, b: Column): Column =
    column(QuantizedDot(expression(a), expression(b)))
  def quantized_cos(a: Column, b: Column): Column =
    column(QuantizedCos(expression(a), expression(b)))
  def z_order2(x: Column, y: Column, bits: Int): Column =
    column(ZOrder2(expression(x), expression(y), bits))
}
