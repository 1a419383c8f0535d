package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators (SURVEY §2.9): as-of join via packed per-key
  * timelines.
  *
  * The composition route (range join + per-row window top-1, see
  * `q_join_asof`) shuffles |left| × avg-matches rows. This operator
  * instead packs the right side into sorted arrays and picks the as-of
  * row with an O(log n) binary-search expression
  * ([[graft.functions.SortedLastLE]]) — no row multiplication, one
  * narrow pass over the fact stream.
  *
  * Packing is per (key, coarse time bucket), NOT per key: a hot key with
  * tens of millions of right rows must never materialize its whole
  * timeline in one aggregation buffer (the OOM shape under key skew).
  * Each buffer holds only one bucket's rows; a per-key bucket index (one
  * entry per NON-EMPTY bucket, bounded by time-span / bucketWidth, not
  * by row count) carries the running "latest entry so far" so probes
  * that miss inside their own bucket — or whose bucket is empty — fall
  * back to the carry in O(log #buckets) without scanning earlier
  * buckets.
  */
object TimeOps {

  /** 30 days in microseconds — the default packing granularity. Tune so
    * (hot-key rows × bucketWidth / key time-span) fits an aggregation
    * buffer: narrower buckets bound memory harder but grow the per-key
    * bucket index. */
  val DefaultBucketWidthMicros: Long = 30L * 24 * 3600 * 1000000L

  /** Floor-division bucket id (exact for negative epochs too: pmod is
    * non-negative, so t − pmod(t, w) is the greatest multiple of w ≤ t
    * and the double division below is exact). */
  private def bucketOf(t: Column, width: Long): Column =
    ((t - pmod(t, lit(width))) / width).cast("long")

  /** For each left row, the latest right row with `rightTime <=
    * leftTime` on the same key. Output: the left columns plus an `asof`
    * struct of `valueCols` (null when no right row qualifies).
    *
    * Right-side ties on time resolve to the greatest value tuple (the
    * sorted struct array orders (time, values…) lexicographically) —
    * the same pick as a `row_number` over (time desc, values desc). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String],
               bucketWidth: Long = DefaultBucketWidthMicros): DataFrame = {
    val v = struct(valueCols.map(col): _*)
    // entry = (t µs, value tuple): lexicographic struct order makes
    // "latest" = max entry, with time ties resolving to greatest values
    val entries = right.select(
      col(rightKey).as("__k"),
      struct(unix_micros(col(rightTime).cast("timestamp_ltz")).as("t"),
        v.as("v")).as("e"))
    // per-(key, bucket) sorted timelines — buffer size = bucket
    // occupancy, never the full per-key history. Materialized eagerly:
    // both the probe join and the bucket index consume it, and Spark
    // does NOT reuse the exchange between the two lineages (measured:
    // the right side was scanned, shuffled, and aggregated twice).
    val packed = Dedup.materialize(entries
      .groupBy(col("__k"), bucketOf(col("e.t"), bucketWidth).as("__b"))
      .agg(sort_array(collect_list(col("e"))).as("tl")))
    val packedArrays = packed.select(col("__k").as("__pk"), col("__b"),
      expr("transform(tl, x -> x.t)").as("__ts"),
      expr("transform(tl, x -> x.v)").as("__vs"))
    // per-key bucket index: for each non-empty bucket, the latest entry
    // over ALL buckets ≤ it (running max over the tiny bucket-level
    // rows; struct max = lexicographic, consistent with the tie rule).
    // The window and the groupBy share the __k partitioning — one
    // shuffle, then arrays bounded by the non-empty-bucket count.
    val wb = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketIndex = packed
      .select(col("__k"), col("__b"), element_at(col("tl"), -1).as("__last"))
      .withColumn("__carry", max(col("__last")).over(wb))
      .groupBy(col("__k"))
      .agg(sort_array(collect_list(struct(col("__b").as("b"),
        col("__carry").as("c")))).as("bi"))
      .select(col("__k").as("__ik"),
        expr("transform(bi, x -> x.b)").as("__bks"),
        expr("transform(bi, x -> x.c.v)").as("__carries"))
    val lt = unix_micros(col(leftTime).cast("timestamp_ltz"))
    val probed = left
      .withColumn("__lt", lt)
      .withColumn("__lb", bucketOf(col("__lt"), bucketWidth))
      .join(packedArrays,
        left(leftKey) === col("__pk") && col("__lb") === col("__b"), "left")
      .join(bucketIndex, left(leftKey) === col("__ik"), "left")
    // in-bucket candidate: last entry with t ≤ probe time (beats any
    // carry — earlier buckets hold strictly earlier times); carry
    // candidate: latest entry of the greatest non-empty bucket < __lb
    probed
      .withColumn("__i",
        graft.functions.exprs.sorted_last_le(col("__ts"), col("__lt")))
      .withColumn("__ci",
        graft.functions.exprs.sorted_last_le(col("__bks"), col("__lb") - 1))
      .withColumn("asof",
        when(col("__i") > 0, element_at(col("__vs"), col("__i")))
          .otherwise(when(col("__ci") > 0,
            element_at(col("__carries"), col("__ci")))))
      .drop("__pk", "__ik", "__b", "__ts", "__vs", "__bks", "__carries",
        "__lt", "__lb", "__i", "__ci")
  }
}
