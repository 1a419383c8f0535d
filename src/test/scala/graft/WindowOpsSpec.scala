package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.WindowOps

/** Hot-key-safe windowed aggregation laws: the two-phase running and
  * trailing forms must match the single-window plan value-for-value on
  * a PLANTED hot key (one key holding 90% of the corpus — the shape
  * that funnels a plain window through one task), and the physical plan
  * must actually partition the fact window by (key, bucket). */
class WindowOpsSpec extends AnyFunSuite with SparkSpec {

  /** 10k rows: key 1 holds 9k (the hot key), keys 2..51 share the rest.
    * Orders are unique but assigned in a shuffled pattern; values are
    * small ints so sums are exact longs. */
  private def planted = {
    import spark.implicits._
    (0 until 10000).map { i =>
      val key = if (i % 10 != 0) 1L else 2L + (i / 10) % 50
      (key, ((i * 2654435761L) % 100000L + 100000L) % 100000L, (i % 97).toLong)
    }.toDF("k", "o", "v")
  }

  test("runningSum equals the single-window running total on a planted hot key") {
    val df = planted
    val plain = df.withColumn("exp", sum(col("v")).over(
      Window.partitionBy(col("k")).orderBy(col("o"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = WindowOps.runningSum(df, "k", "o", "v", "run")
    val g = got.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val e = plain.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(g.size == 10000 && g == e,
      "two-phase running sum diverged from the single-window plan")
    // the fact-table window must be keyed on (k, __wb) — that split IS
    // the hot-key parallelism (bucket count tasks for key 1, not one)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("__wb"),
      "expected the within-bucket window over (key, __wb) in the plan")
  }

  test("trailingSum equals the single-window trailing range frame, ties included") {
    import spark.implicits._
    // add TIED order values (o % 5000) so range-frame tie semantics are
    // exercised across bucket boundaries too
    val df = planted.withColumn("o", col("o") % 5000)
    val win = 700L
    val plain = df.withColumn("exp", sum(col("v")).over(
      Window.partitionBy(col("k")).orderBy(col("o")).rangeBetween(-win, 0)))
    // ties share a frame, so (k, o) determines the sum — compare the
    // distinct (k, o) -> sum maps
    val e = plain.select("k", "o", "exp").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = WindowOps.trailingSum(df, "k", "o", "v", "trail", win)
    val g = got.select("k", "o", "trail").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.count() == 10000, "context rows must be dropped, originals kept")
    assert(g == e,
      "two-phase trailing sum diverged from the single-window plan")
  }

  test("trailingSum stays exact when the window forces bucket widening") {
    // nBuckets so high that ideal width < win: the operator must widen
    // buckets to >= win (one-hop context) instead of going wrong
    val df = planted
    val win = 30000L // vs domain ~100k: ideal width at 64 buckets ≈ 1.5k
    val plain = df.withColumn("exp", sum(col("v")).over(
      Window.partitionBy(col("k")).orderBy(col("o")).rangeBetween(-win, 0)))
    val e = plain.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val g = WindowOps.trailingSum(df, "k", "o", "v", "t", win, nBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(g == e, "widened-bucket trailing sum diverged")
  }

  test("runningStats: sum/cnt/min/max all merge correctly across buckets") {
    val df = planted
    val w = Window.partitionBy(col("k")).orderBy(col("o"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val plain = df.select(col("k"), col("o"),
      sum(col("v")).over(w).as("s"), count(col("v")).over(w).as("c"),
      min(col("v")).over(w).as("mn"), max(col("v")).over(w).as("mx"))
    val e = plain.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val g = WindowOps.runningStats(df, "k", "o", "v", "r")
      .select("k", "o", "r_sum", "r_cnt", "r_min", "r_max").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(g.size == 10000 && g == e,
      "two-phase running stats diverged from the single-window plan " +
        "(least/greatest prefix merge or count merge is wrong)")
  }

  test("trailingStats: count and exact-division average match the plain frame") {
    val df = planted
    val win = 700L
    val w = Window.partitionBy(col("k")).orderBy(col("o")).rangeBetween(-win, 0)
    val plain = df.select(col("k"), col("o"),
      count(col("v")).over(w).as("c"),
      (sum(col("v")).over(w).cast("double") / count(col("v")).over(w)).as("a"))
    val e = plain.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val g = WindowOps.trailingStats(df, "k", "o", "v", "t", win)
      .select("k", "o", "t_cnt", "t_avg").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // exact integer sum and count, then one IEEE division — bitwise
    // comparable, no float-accumulation tolerance needed
    assert(g.size == 10000 && g == e,
      "padded-bucket trailing avg diverged from the single-window plan")
  }

  test("degenerate domains: empty input and single order value") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "o", "v")
    assert(WindowOps.runningSum(empty, "k", "o", "v", "r").count() == 0)
    assert(WindowOps.trailingSum(empty, "k", "o", "v", "t", 10L).count() == 0)
    // all rows share one order value: every row's frame is the whole key
    val flat = Seq((1L, 7L, 3L), (1L, 7L, 4L), (2L, 7L, 5L)).toDF("k", "o", "v")
    assert(WindowOps.runningSum(flat, "k", "o", "v", "r").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq ==
      Seq((1L, 7L), (1L, 7L), (2L, 5L)))
    assert(WindowOps.trailingSum(flat, "k", "o", "v", "t", 10L).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq ==
      Seq((1L, 7L), (1L, 7L), (2L, 5L)))
    // NULL order values fail loudly in the bounds pass: a null has no
    // range bucket, and plain RANGE windows exclude nulls from
    // non-null frames — silent divergence is the one wrong option
    val withNull = Seq((1L, Some(3L), 2L), (1L, None, 4L))
      .toDF("k", "o", "v")
    val ex = intercept[IllegalArgumentException] {
      WindowOps.runningSum(withNull, "k", "o", "v", "r").collect()
    }
    assert(ex.getMessage.contains("NULL 'o'"))
  }
}

/** equiDepthHistogram must be bit-identical to the NTILE window form —
  * the whole point is replacing the global single-task sort with a
  * range exchange, never changing a bucket boundary. */
class EquiDepthHistogramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, b: Int) =
    df.select(ntile(b).over(Window.orderBy(col("v"), col("id"))).as("bucket")
        .cast("long"), col("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq

  private def viaOp(df: org.apache.spark.sql.DataFrame, b: Int) =
    WindowOps.equiDepthHistogram(df, "id", "v", b)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq

  test("matches NTILE for n % B != 0, ties, and B > n") {
    // 23 rows over 5 buckets: first 3 buckets get 5 rows, last 2 get 4
    val df = (1L to 23L).map(i => (i, (i % 7).toDouble)).toDF("id", "v")
    assert(viaOp(df, 5) == viaWindow(df, 5))
    // all-tied values: id tie-break decides every boundary
    val tied = (1L to 10L).map(i => (i, 42.0)).toDF("id", "v")
    assert(viaOp(tied, 3) == viaWindow(tied, 3))
    // more buckets than rows: each row its own bucket, no empty buckets
    val tiny = (1L to 4L).map(i => (i, i.toDouble)).toDF("id", "v")
    assert(viaOp(tiny, 10) == viaWindow(tiny, 10))
  }

  test("empty input yields an empty histogram, not a failure") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(WindowOps.equiDepthHistogram(empty, "id", "v", 10).count() == 0)
  }
}
