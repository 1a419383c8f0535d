package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key-safe windowed aggregation (SURVEY §2.9 scale notes).
  *
  * A window function shuffles once on its partition key and then runs
  * each key's frame in ONE task — a hot key (one user producing 10% of
  * a 100 TB event log) funnels that slice through a single sorter, the
  * windowed twin of the join skew [[Skew.saltedJoin]] addresses. The
  * running/moving shapes decompose instead, because their aggregates
  * are algebraic over an ORDER the salt must respect:
  *
  *  - [[runningSum]]: two-phase prefix sum. Range-bucket the order
  *    column, compute within-bucket running sums in parallel (the
  *    window key becomes (key, bucket) — hot-key parallelism = bucket
  *    count), then add each bucket's prior-bucket total, a per-(key,
  *    bucket) frame that is `nBuckets` rows per key. Same decomposition
  *    as `TextOps.packOffsets`, generalized to per-key windows.
  *  - [[trailingSum]]: bucket + boundary overlap. Rows within `win` of
  *    their bucket's end are REPLICATED into the next bucket as
  *    context-only rows (bucket width is forced ≥ `win`, so one hop
  *    always suffices); each padded bucket then computes its trailing
  *    range frames with full context and context rows are dropped.
  *    Replication is bounded by win/width ≤ 1 — worst case 2×, typical
  *    corpora far less.
  *
  * Both match the single-window plan value-for-value (RANGE frame
  * semantics — ties share a frame, so results are deterministic under
  * any partitioning); `WindowOpsSpec` pins the equality on a planted
  * hot key holding 90% of the corpus. The order column must be numeric
  * and non-null (RANGE frames require it; bucketing inherits the
  * requirement).
  */
object WindowOps {

  /** Order-domain bounds as doubles; None for an empty frame. Fails
    * loudly on NULL order values (one extra column in the same agg
    * pass): a null has no range bucket, and the bucket-null group
    * would silently leak its totals into bucket 0's prefix — plain
    * RANGE windows exclude nulls from non-null frames, so the
    * two-phase result would diverge instead of matching. */
  private def bounds(df: DataFrame, order: String): Option[(Double, Double)] = {
    val b = df.agg(min(col(order)).cast("double"),
      max(col(order)).cast("double"),
      count(when(col(order).isNull, lit(1))).as("n_null")).head()
    require(b.getLong(2) == 0L,
      s"WindowOps: ${b.getLong(2)} rows have a NULL '$order' — range " +
        "frames need a non-null numeric order; filter or impute first")
    if (b.isNullAt(0)) None else Some((b.getDouble(0), b.getDouble(1)))
  }

  /** Deterministic range bucket of `order`: floor((o − lo) / width),
    * capped into [0, nBuckets). A pure function of the order VALUE, so
    * tied rows always share a bucket and range semantics survive the
    * split. */
  private def bucketExpr(order: String, lo: Double, width: Double,
                         nBuckets: Int) =
    least(lit(nBuckets - 1),
      floor((col(order).cast("double") - lo) / width)).cast("int")

  /** Per-(key, order-range) running total of `value` — equal to
    * `sum(value) OVER (PARTITION BY key ORDER BY order RANGE UNBOUNDED
    * PRECEDING)` but with hot-key work spread over `nBuckets` tasks.
    * One bounds pass (columnar min/max scan), one fact shuffle on
    * (key, bucket), then a per-key `nBuckets`-row prefix over bucket
    * totals joined back on the partitioning the fact already has. */
  def runningSum(df: DataFrame, key: String, order: String, value: String,
                 out: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets > 0, s"runningSum: nBuckets must be positive, got $nBuckets")
    val plain = Window.partitionBy(col(key)).orderBy(col(order))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    bounds(df, order) match {
      case None => df.withColumn(out, sum(col(value)).over(plain)) // empty
      case Some((lo, hi)) =>
        val width = math.max((hi - lo) / nBuckets, 1e-9)
        val withB = df.withColumn("__wb", bucketExpr(order, lo, width, nBuckets))
        val w = Window.partitionBy(col(key), col("__wb")).orderBy(col(order))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val within = withB.withColumn("__within", sum(col(value)).over(w))
        // bucket totals: nBuckets rows per key — the tiny frame the
        // second phase prefixes and ships back
        val priorW = Window.partitionBy(col(key)).orderBy(col("__wb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val prior = withB.groupBy(col(key), col("__wb"))
          .agg(sum(col(value)).as("__bt"))
          .withColumn("__prior", sum(col("__bt")).over(priorW))
          .drop("__bt")
        within.join(prior, Seq(key, "__wb"))
          .withColumn(out,
            col("__within") + coalesce(col("__prior"), lit(0)))
          .drop("__wb", "__within", "__prior")
    }
  }

  /** Per-(key, order-range) trailing-window total — equal to
    * `sum(value) OVER (PARTITION BY key ORDER BY order RANGE BETWEEN
    * win PRECEDING AND CURRENT ROW)` with hot-key work spread over
    * range buckets. Bucket width is forced ≥ `win`, so a frame reaches
    * at most one bucket back, and exactly the rows within `win` of a
    * boundary are replicated forward as droppable context. */
  def trailingSum(df: DataFrame, key: String, order: String, value: String,
                  out: String, win: Long, nBuckets: Int = 32): DataFrame =
    trailingOver(df, key, order, win, nBuckets,
      w => Seq(out -> sum(col(value)).over(w)))

  /** The padded-bucket trailing machinery, generalized: bucket, pad the
    * boundary margin forward, evaluate ALL `aggs` window columns in one
    * (key, bucket) pass, drop context rows. Any aggregate is valid here
    * — the padded bucket holds every row of every kept row's true
    * frame, so the window computes the exact single-partition answer
    * (min/max/avg included, which NO merge-based decomposition of
    * trailing frames could provide). */
  private def trailingOver(df: DataFrame, key: String, order: String,
                           win: Long, nBuckets: Int,
                           aggs: org.apache.spark.sql.expressions.WindowSpec =>
                             Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(win > 0, s"trailing window: win must be positive, got $win")
    require(nBuckets > 0, s"trailing window: nBuckets must be positive, got $nBuckets")
    bounds(df, order) match {
      case None =>
        val plain = Window.partitionBy(col(key)).orderBy(col(order))
          .rangeBetween(-win, 0)
        aggs(plain).foldLeft(df) { case (d, (o, c)) => d.withColumn(o, c) }
      case Some((lo, hi)) =>
        val width = math.max((hi - lo) / nBuckets, win.toDouble)
        val withB = df.withColumn("__wb", bucketExpr(order, lo, width, nBuckets))
        // forward-replicate the boundary margin: a row in bucket b+1 at
        // order o needs [o − win, o), whose bucket-b slice is exactly
        // the rows with order + win ≥ that bucket's lower edge (an fp
        // epsilon over-replicates harmlessly — context rows are dropped
        // and range frames ignore out-of-range neighbors)
        val ctx = withB
          .filter(col(order).cast("double") + win >=
            lit(lo) + (col("__wb") + 1) * width - width * 1e-9)
          .withColumn("__wb", col("__wb") + 1)
          .withColumn("__ctx", lit(true))
        val padded = withB.withColumn("__ctx", lit(false)).unionByName(ctx)
        val w = Window.partitionBy(col(key), col("__wb")).orderBy(col(order))
          .rangeBetween(-win, 0)
        aggs(w).foldLeft(padded) { case (d, (o, c)) => d.withColumn(o, c) }
          .filter(!col("__ctx")).drop("__wb", "__ctx")
    }
  }

  /** Trailing count and average in the same single padded pass as
    * [[trailingSum]]: `<out>_cnt` and `<out>_avg` (exact decimal/long
    * sum divided as double — deterministic, no float accumulation).
    * The padded-bucket route is the ONLY two-phase shape that covers
    * avg/min/max: trailing frames cannot be merged from bucket totals
    * the way running prefixes can, because a frame's cut of the
    * previous bucket depends on the row. */
  def trailingStats(df: DataFrame, key: String, order: String, value: String,
                    out: String, win: Long, nBuckets: Int = 32): DataFrame =
    trailingOver(df, key, order, win, nBuckets, w => Seq(
      s"${out}_cnt" -> count(col(value)).over(w),
      s"${out}_avg" ->
        (sum(col(value)).over(w).cast("double") / count(col(value)).over(w))))

  /** Running sum, count, min and max in one two-phase pass — the
    * general associative-merge form of [[runningSum]]: within-bucket
    * windows compute all four over ONE (key, bucket) sort, the per-key
    * bucket-total prefix merges them (sum+sum, cnt+cnt, least, greatest
    * — `least`/`greatest` skip the null first-bucket prefix), and the
    * back-join lands on the partitioning the fact already has. Adds
    * `<out>_sum`, `<out>_cnt`, `<out>_min`, `<out>_max`. */
  def runningStats(df: DataFrame, key: String, order: String, value: String,
                   out: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets > 0, s"runningStats: nBuckets must be positive, got $nBuckets")
    bounds(df, order) match {
      case None =>
        val plain = Window.partitionBy(col(key)).orderBy(col(order))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn(s"${out}_sum", sum(col(value)).over(plain))
          .withColumn(s"${out}_cnt", count(col(value)).over(plain))
          .withColumn(s"${out}_min", min(col(value)).over(plain))
          .withColumn(s"${out}_max", max(col(value)).over(plain))
      case Some((lo, hi)) =>
        val width = math.max((hi - lo) / nBuckets, 1e-9)
        val withB = df.withColumn("__wb", bucketExpr(order, lo, width, nBuckets))
        val w = Window.partitionBy(col(key), col("__wb")).orderBy(col(order))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        val within = withB
          .withColumn("__ws", sum(col(value)).over(w))
          .withColumn("__wc", count(col(value)).over(w))
          .withColumn("__wmin", min(col(value)).over(w))
          .withColumn("__wmax", max(col(value)).over(w))
        val priorW = Window.partitionBy(col(key)).orderBy(col("__wb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val prior = withB.groupBy(col(key), col("__wb"))
          .agg(sum(col(value)).as("__bs"), count(col(value)).as("__bc"),
            min(col(value)).as("__bmin"), max(col(value)).as("__bmax"))
          .select(col(key), col("__wb"),
            sum(col("__bs")).over(priorW).as("__ps"),
            sum(col("__bc")).over(priorW).as("__pc"),
            min(col("__bmin")).over(priorW).as("__pmin"),
            max(col("__bmax")).over(priorW).as("__pmax"))
        within.join(prior, Seq(key, "__wb"))
          .withColumn(s"${out}_sum", col("__ws") + coalesce(col("__ps"), lit(0)))
          .withColumn(s"${out}_cnt", col("__wc") + coalesce(col("__pc"), lit(0L)))
          .withColumn(s"${out}_min", least(col("__wmin"), col("__pmin")))
          .withColumn(s"${out}_max", greatest(col("__wmax"), col("__pmax")))
          .drop("__wb", "__ws", "__wc", "__wmin", "__wmax",
            "__ps", "__pc", "__pmin", "__pmax")
    }
  }

  /** Exact equi-depth histogram — `NTILE(nBuckets) OVER (ORDER BY value,
    * id)` semantics WITHOUT the global single-task sort that window
    * carries: `repartitionByRange(value, id)` (the distributed ORDER BY
    * range exchange), per-partition local sorts, and per-partition row
    * counts (≤ shuffle-partition tuples to the driver) convert
    * within-partition `row_number` into an exact global rank, exactly
    * the `EntityRes.sortedNeighborhoodPairs` rank construction. NTILE's
    * law — first (n mod B) buckets get ⌈n/B⌉ rows, the rest ⌊n/B⌋ — is
    * then a pure formula of (rank, n, B), so the result is bit-identical
    * to the window form while the plan stays one range exchange + one
    * B-row aggregate. Per-bucket (bucket, n, lo, hi) with 1-based
    * buckets, matching NTILE.
    *
    * Ties: (value, id) totally orders rows, so bucket boundaries are
    * deterministic — the id tie-break is what makes the oracle able to
    * reproduce the split inside a tied value run. */
  def equiDepthHistogram(df: DataFrame, idCol: String, valueCol: String,
                         nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"equiDepthHistogram: nBuckets >= 1, got $nBuckets")
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val t = df.select(col(idCol).cast("long").as("id"),
      col(valueCol).cast("double").as("v"))
    // materialized: the offset join must see ONE consistent partition
    // assignment (range boundaries are sampled per execution)
    val sorted = Dedup.materialize(
      t.repartitionByRange(nPart, col("v"), col("id"))
        .sortWithinPartitions("v", "id")
        .withColumn("pid", spark_partition_id()))
    val sizes = sorted.groupBy("pid").agg(count(lit(1)).as("c"))
      .orderBy("pid").collect().map(r => (r.getInt(0), r.getLong(1)))
    val n = sizes.map(_._2).sum
    if (n == 0L) {
      // empty-input law: an empty histogram, not a div-by-zero
      return sorted.select(lit(1L).as("bucket"), lit(0L).as("n"),
        lit(0.0).as("lo"), lit(0.0).as("hi")).limit(0)
    }
    val offsets = sizes.scanLeft((0, 0L)) {
      case ((_, acc), (p, c)) => (p, acc + c)
    }.init.zip(sizes).map { case ((_, before), (p, _)) => (p, before) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("pid", "poff")
    val w = Window.partitionBy("pid").orderBy("v", "id")
    val big = n / nBuckets       // small-bucket size
    val r = n % nBuckets         // count of (big+1)-sized leading buckets
    val cut = r * (big + 1L)     // first rank owned by a small bucket
    sorted.join(broadcast(offDf), Seq("pid"))
      .withColumn("rk", row_number().over(w).cast("long") - 1L + col("poff"))
      .withColumn("bucket",
        (when(col("rk") < cut, expr(s"rk div ${big + 1L}L"))
          .otherwise(lit(r) + expr(s"(rk - ${cut}L) div ${math.max(big, 1L)}L"))
          + 1L).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
  }
}
