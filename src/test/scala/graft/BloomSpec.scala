package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomOps
import graft.operators.Curation

/** The Bloom decontamination path: the build-side bitmap aggregation and
  * the membership expression must derive identical probe positions (a
  * mismatch is a false NEGATIVE — a contaminated document silently
  * kept), and the exact-confirm phase must make the final result
  * identical to the exact-set plan for ANY bitmap sizing, including one
  * deliberately undersized to force heavy false positives.
  */
class BloomSpec extends AnyFunSuite with SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Set[Seq[String]] =
    df.collect().map(r =>
      Seq.tabulate(r.length)(i =>
        if (r.isNullAt(i)) "<NULL>" else r.get(i).toString)).toSet

  private def corpusBench(d: String) = {
    val docs = graft.sources.Tables.documents(spark, d)
    (docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0))
  }

  test("no false negatives: every inserted hash passes the membership probe") {
    import spark.implicits._
    // adversarial inputs included: 0, -1, Long extremes, near-collisions
    val hashes = (Seq(0L, -1L, 1L, Long.MaxValue, Long.MinValue, 42L) ++
      (1 to 500).map(i => i * 0x9E3779B97F4A7C15L + 7)).distinct
    val mBits = 1 << 12
    val k = 5
    val bm = Curation.buildBloomBitmap(hashes.toDF("h"), "h", mBits, k)
    assert(bm.length == mBits / 64)
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bm)
    hashes.foreach { h =>
      assert(BloomOps.mightContain(h, ad, k),
        s"inserted hash $h reported absent — build/probe position drift")
    }
  }

  test("false-positive rate on disjoint probes is near theory, not near 1") {
    import spark.implicits._
    val inserted = (1 to 1000).map(i => i * 0x9E3779B97F4A7C15L + 7)
    val probes = (1 to 2000).map(i => i * 0xC2B2AE3D27D4EB4FL + 13)
      .filterNot(inserted.toSet)
    val mBits = 1 << 14 // n/m = 1000/16384, k=5 -> theoretical fpp ~0.5%
    val k = 5
    val bm = Curation.buildBloomBitmap(inserted.toDF("h"), "h", mBits, k)
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(bm)
    val fp = probes.count(BloomOps.mightContain(_, ad, k))
    val rate = fp.toDouble / probes.size
    assert(rate < 0.05, f"false-positive rate $rate%.4f — expected well " +
      "under 5%% at this sizing; probe positions are likely degenerate")
  }

  test("membership probe is loud on a non-power-of-two bitmap") {
    val bad = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Long](3))
    val e = intercept[IllegalArgumentException] {
      BloomOps.mightContain(1L, bad, 5)
    }
    assert(e.getMessage.contains("power of two"))
  }

  test("bloom path == exact path at sf0.001 (default sizing)") {
    val (corpus, bench) = corpusBench(dir)
    val exact = canon(Curation.contaminatedDocs(corpus, bench, "doc_id", "text"))
    val bloom = canon(
      Curation.contaminatedDocsBloom(corpus, bench, "doc_id", "text"))
    assert(exact.nonEmpty, "exact decontamination found nothing — vacuous")
    assert(bloom == exact, s"bloom path diverged: only-exact=" +
      s"${(exact -- bloom).take(3)} only-bloom=${(bloom -- exact).take(3)}")
  }

  test("exact-confirm kills false positives: parity holds at a 64x undersized bitmap") {
    val (corpus, bench) = corpusBench(dir)
    val exact = canon(Curation.contaminatedDocs(corpus, bench, "doc_id", "text"))
    // 2^10 bits for thousands of benchmark shingles: the bitmap saturates
    // and nearly every corpus shingle survives the prefilter — the
    // confirm join must still produce the exact answer
    val bloom = canon(Curation.contaminatedDocsBloom(
      corpus, bench, "doc_id", "text", mBits = 1 << 10, k = 3))
    assert(bloom == exact,
      "undersized bitmap leaked false positives past the exact confirm")
  }

  test("prefilter selectivity: default bitmap drops the non-overlap bulk scan-side") {
    val (corpus, bench) = corpusBench(dir)
    val b = graft.operators.Dedup.shingleHashesFlat(bench, "doc_id", "text")
      .select(explode(col("hs")).as("h")).distinct()
    val bm = Curation.buildBloomBitmap(b, "h", 1 << 20, 5)
    val postings = graft.operators.Dedup
      .shingleHashesFlat(corpus, "doc_id", "text")
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val total = postings.count()
    val kept = postings.filter(graft.functions.exprs
      .bloom_might_contain(col("h"), typedLit(bm), 5)).count()
    val exactOverlap = postings.join(b, Seq("h")).count()
    // kept = true overlaps + false positives; at 2^20 bits the fp tail
    // must be a sliver of the corpus posting volume
    assert(kept >= exactOverlap, "bloom dropped a true overlap (false negative)")
    assert(kept - exactOverlap <= (total * 0.02).toLong + 10,
      s"bloom kept $kept of $total postings (exact overlap $exactOverlap) " +
        "— prefilter is not selective, the 100 TB story collapses")
  }

  test("membership probe indexes in Long: no wrap on a 2^26-word (2^32-bit) bitmap") {
    // Regression law for the Int-truncation fix: with words > 2^25 the
    // bit mask exceeds Int.MaxValue, and an Int cast of the masked
    // position wraps negative — probing garbage words instead of the
    // Kirsch–Mitzenstein positions. A 2^26-long array is 512 MB, so the
    // bitmap is VIRTUAL: a sparse ArrayData backed by exactly the words
    // the correct Long math populates. A wrapped probe reads an empty
    // word and comes back false.
    import org.apache.spark.sql.catalyst.util.ArrayData
    val words = 1 << 26
    val mask = words.toLong * 64L - 1L
    val k = 5
    // hashes chosen so at least one probe position exceeds 2^31
    val hashes = Seq(0x7fffffffffL, -987654321012345L, 42L, Long.MinValue + 7)
    val set = scala.collection.mutable.HashMap.empty[Int, Long]
    for (h <- hashes) {
      val h2 = BloomOps.mixOdd(h)
      for (i <- 0 until k) {
        val pos = (h + i * h2) & mask
        set(( pos >>> 6).toInt) = set.getOrElse((pos >>> 6).toInt, 0L) |
          (1L << (pos & 63L).toInt)
      }
    }
    // sanity: the fixture actually exercises the high range
    assert(hashes.exists { h =>
      val h2 = BloomOps.mixOdd(h)
      (0 until k).exists(i => ((h + i * h2) & mask) > Int.MaxValue.toLong)
    }, "fixture never probes past 2^31 — weaken nothing, pick other hashes")
    val sparse: ArrayData = new ArrayData {
      override def numElements(): Int = words
      override def getLong(i: Int): Long = set.getOrElse(i, 0L)
      override def isNullAt(i: Int): Boolean = false
      override def copy(): ArrayData = this
      override def array: Array[Any] = throw new UnsupportedOperationException
      override def setNullAt(i: Int): Unit = throw new UnsupportedOperationException
      override def update(i: Int, v: Any): Unit = throw new UnsupportedOperationException
      override def get(i: Int, dt: org.apache.spark.sql.types.DataType): AnyRef =
        java.lang.Long.valueOf(getLong(i))
      override def getBoolean(i: Int): Boolean = throw new UnsupportedOperationException
      override def getByte(i: Int): Byte = throw new UnsupportedOperationException
      override def getShort(i: Int): Short = throw new UnsupportedOperationException
      override def getInt(i: Int): Int = throw new UnsupportedOperationException
      override def getFloat(i: Int): Float = throw new UnsupportedOperationException
      override def getDouble(i: Int): Double = throw new UnsupportedOperationException
      override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
        throw new UnsupportedOperationException
      override def getUTF8String(i: Int): org.apache.spark.unsafe.types.UTF8String =
        throw new UnsupportedOperationException
      override def getBinary(i: Int): Array[Byte] = throw new UnsupportedOperationException
      override def getInterval(i: Int): org.apache.spark.unsafe.types.CalendarInterval =
        throw new UnsupportedOperationException
      override def getStruct(i: Int, n: Int): org.apache.spark.sql.catalyst.InternalRow =
        throw new UnsupportedOperationException
      override def getArray(i: Int): ArrayData = throw new UnsupportedOperationException
      override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData =
        throw new UnsupportedOperationException
      override def getVariant(i: Int): org.apache.spark.unsafe.types.VariantVal =
        throw new UnsupportedOperationException
      override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal =
        throw new UnsupportedOperationException
      override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal =
        throw new UnsupportedOperationException
    }
    for (h <- hashes)
      assert(BloomOps.mightContain(h, sparse, k),
        s"inserted hash $h not found — a probe position wrapped")
    // and a disjoint hash still misses (the sparse fixture is not all-ones)
    assert(!BloomOps.mightContain(0x123456789abL, sparse, k) ||
      set.size >= words, "unexpected dense fixture")
  }
}
