package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered equi-join: the runtime-filter pattern for the
  * "100 TB fact ⋈ selective dim subset" shape. The small side's join
  * keys compress to an mBits-bit Bloom bitmap (built distributively —
  * the driver receives the bitmap's words, never the key set, see
  * [[Curation.buildBloomBitmap]]); the big side drops non-member rows
  * AT THE SCAN through the codegen'd
  * [[graft.functions.BloomMightContain]] before its shuffle, so the
  * exchange carries only true matches plus the Bloom's false-positive
  * sliver; the exact join then kills the false positives. The result is
  * therefore EXACT — identical to the plain join for any (mBits, k).
  *
  * This is what Spark's AQE runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) does for plans
  * it recognizes; the explicit operator makes the guarantee available
  * to any composed plan, with a deterministic bitmap a spec can pin.
  */
object BloomJoin {

  /** Next power of two ≥ 16 bits/key, clamped to [2^16, 2^27] (8 KiB –
    * 16 MiB): ~16 bits/key at k=5 gives ≲ 0.1% false positives, and the
    * cap keeps the broadcast bitmap bounded no matter how large the
    * "small" side grows (past it, the filter degrades gracefully toward
    * pass-through rather than blowing driver memory). */
  private[graft] def autoBits(nKeys: Long): Int = {
    val target = 16L * math.max(nKeys, 1L)
    var m = 1 << 16
    while (m < target && m < (1 << 27)) m <<= 1
    m
  }

  /** Inner-join `big ⋈ small` on `bigKey = smallKey`, Bloom-prefiltered
    * on the big side. The small side is materialized once: the bitmap
    * build, the key count and the exact join must all see ONE snapshot
    * (a re-evaluated non-deterministic small side could otherwise admit
    * rows the bitmap never saw — breaking exactness, not just speed).
    * Join strategy for the exact confirm is left to AQE: the prefiltered
    * stream is small, and the small side never needs to fit in executor
    * memory for the plan to hold. */
  def bloomEquiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    k: Int = 5, mBitsOverride: Option[Int] = None): DataFrame = {
    val sm = Dedup.materialize(small)
    val keys = sm.select(xxhash64(col(smallKey)).as("h")).distinct()
    val mBits = mBitsOverride.getOrElse {
      autoBits(sm.agg(countDistinct(col(smallKey))).head().getLong(0))
    }
    val bitmap = Curation.buildBloomBitmap(keys, "h", mBits, k)
    big.filter(graft.functions.exprs.bloom_might_contain(
        xxhash64(col(bigKey)), typedLit(bitmap), k))
      .join(sm, col(bigKey) === col(smallKey))
  }
}
