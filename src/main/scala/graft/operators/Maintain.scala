package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of derived tables — the operations that keep
  * a 100 TB warehouse's aggregates and snapshots current WITHOUT
  * rescanning the base corpus on every refresh.
  *
  * The reference pipeline recomputes everything daily (its inputs are
  * KBs); at warehouse scale the daily delta is the only thing that can
  * be scanned, so aggregates persist in MERGEABLE partial form
  * (count + exact decimal sum — associative and commutative, so any
  * partition of the data into deltas folds to the same result) and
  * refreshes fold the new delta's partials into the stored ones.
  */
object Maintain {

  /** Per-key mergeable partials for count/sum maintenance:
    * (key, cnt, total) with `total` an exact DECIMAL(18,2) — decimal,
    * not double, because merge order must not perturb the result (a
    * double sum re-associated across delta boundaries drifts in the
    * last ulp; the whole point of partials is that base+delta equals
    * the one-shot recompute EXACTLY). */
  def aggPartials(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(valCol).cast(DecimalType(18, 2))).as("total"))

  /** Writes [[aggPartials]] as the persisted materialized-aggregate
    * state, partition-free parquet (the key space is the grain; at
    * warehouse scale callers bucket by key instead — see
    * [[graft.sources.Sinks.writeBucketed]]). */
  def writeAggState(df: DataFrame, keyCol: String, valCol: String,
                    dir: String): Unit =
    aggPartials(df, keyCol, valCol)
      .write.mode("overwrite").parquet(dir)

  /** Refreshed aggregate = stored partials ∪ delta partials, folded
    * per key: counts add, decimal sums add. The base table is NEVER
    * read — the refresh scans |state| + |delta| rows, and the state
    * row count is bounded by key cardinality, not corpus size. Returns
    * (key, cnt, total) in the same mergeable form, so refreshes chain:
    * fold in delta 1, write, fold in delta 2, ... equals the one-shot
    * aggregate over base ∪ all deltas (decimal addition is
    * associative). */
  def mergeAggState(spark: SparkSession, dir: String, delta: DataFrame,
                    keyCol: String, valCol: String): DataFrame = {
    val state = spark.read.parquet(dir)
    state.unionByName(aggPartials(delta, keyCol, valCol))
      .groupBy(col(keyCol))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).cast(DecimalType(18, 2)).as("total"))
  }

  /** Streaming refresh layout: base partials at `$dir/base` plus one
    * `ingest_batch=<id>` partition per micro-batch under `$dir/batches`
    * (written by `StreamOps.maintainAggStream`); [[readAggRefreshed]]
    * folds them. A replayed micro-batch REWRITES its own partition with
    * identical partials (deterministic aggregation of the same rows), so
    * foreachBatch's at-least-once redelivery can never double-fold —
    * the same partition-overwrite idempotence argument as the ingestion
    * dedup sinks. */
  def writeAggBase(df: DataFrame, keyCol: String, valCol: String,
                   dir: String): Unit =
    aggPartials(df, keyCol, valCol).write.mode("overwrite").parquet(s"$dir/base")

  /** The refreshed aggregate: base partials ∪ every committed
    * micro-batch's partials, folded per key. Scans |state| + Σ|batch
    * partials| rows — each bounded by key cardinality, never corpus
    * size. Works before any batch arrives (base alone). */
  def readAggRefreshed(spark: SparkSession, dir: String,
                       keyCol: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/base")
    val batchesPath = new org.apache.hadoop.fs.Path(s"$dir/batches")
    val fs = batchesPath.getFileSystem(spark.sessionState.newHadoopConf())
    val all =
      if (fs.exists(batchesPath))
        base.unionByName(
          spark.read.parquet(s"$dir/batches").drop("ingest_batch"))
      else base
    all.groupBy(col(keyCol))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).cast(DecimalType(18, 2)).as("total"))
  }

  /** Persisted mergeable approx-distinct state: one DataSketches HLL
    * sketch (binary, default lgConfigK=12, rsd ≈ 1.6%) per key.
    * COUNT(DISTINCT) is not distributive — exact refresh would rescan
    * the base — but HLL register maxima are: union(sketch(base),
    * sketch(delta)) = sketch(base ∪ delta) EXACTLY (same registers, not
    * approximately), so the persisted state refreshes from the delta
    * alone and the estimate equals the one-shot sketch's. State size:
    * |keys| × 2^lgK registers — key-cardinality-bounded. */
  def writeDistinctState(df: DataFrame, keyCol: String, valCol: String,
                         dir: String): Unit =
    df.groupBy(col(keyCol))
      .agg(hll_sketch_agg(col(valCol)).as("hll"))
      .write.mode("overwrite").parquet(dir)

  /** Refreshed per-key distinct ESTIMATE: stored sketches ∪ the delta's
    * sketches, register-wise max under `hll_union_agg`, estimated once
    * at read. Chains like [[mergeAggState]]: any split of the data into
    * deltas folds to the identical registers (union is associative,
    * commutative, idempotent — re-folding a replayed delta cannot move
    * the estimate, a property plain counters lack). */
  def mergeDistinctState(spark: SparkSession, dir: String, delta: DataFrame,
                         keyCol: String, valCol: String): DataFrame =
    spark.read.parquet(dir)
      .unionByName(delta.groupBy(col(keyCol))
        .agg(hll_sketch_agg(col(valCol)).as("hll")))
      .groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("est"))

  /** Snapshot diff: classify every id in `prev` ∪ `next` as `added`
    * (only in next), `removed` (only in prev) or `changed` (in both
    * with different payload hash); unchanged rows are DROPPED — the
    * output is bounded by churn volume, not corpus size, which is what
    * makes a 100 TB-corpus diff consumable. One co-partitioned full
    * outer join on the id, carrying only (id, md5(payload)) — payload
    * columns are pruned at both scans; the hashes are computed
    * distributively, never compared row-by-row on the driver. */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
                   payloadCol: String): DataFrame = {
    def hashed(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).cast("long").as(idCol),
        md5(col(payloadCol).cast("binary")).as(s"h_$side"))
    hashed(prev, "prev")
      .join(hashed(next, "next"), Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("h_prev").isNull, lit("added"))
          .when(col("h_next").isNull, lit("removed"))
          .when(col("h_prev") =!= col("h_next"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }
}
