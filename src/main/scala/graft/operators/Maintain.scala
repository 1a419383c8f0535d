package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    val state = Dedup.readPq(spark, dir)
    state.unionByName(aggPartials(delta, keyCol, valCol))
      .groupBy(col(keyCol))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).cast(DecimalType(18, 2)).as("total"))
  }

  /** Deletion-aware refresh: count/sum are DISTRIBUTIVE over signed
    * contributions, so a delete is just a NEGATIVE partial — unlike
    * top-k (which needs the slack ledger) the aggregate leg stays
    * EXACT under deletes with zero extra state. `deletes` carries the
    * deleted rows' images (key + value — the standard CDC delete
    * payload; a bare id cannot retract a sum). Retracting rows never
    * inserted is a caller error and raises in-plan (negative count, or
    * a zeroed count with a non-zero residual sum — a value-mismatched
    * retraction); keys whose rows are all deleted drop from the
    * result, matching the one-shot recompute. */
  def mergeAggStateWithDeletes(spark: SparkSession, dir: String,
                               delta: DataFrame, deletes: DataFrame,
                               keyCol: String, valCol: String): DataFrame =
    foldSignedAgg(Dedup.readPq(spark, dir), delta, deletes, keyCol, valCol)

  /** The signed fold shared by [[mergeAggStateWithDeletes]] (read-only
    * refresh over the flat layout) and [[foldAggStateWithDeletes]]
    * (in-place CDC fold over the meta'd layout): state ∪ delta
    * partials ∪ NEGATED delete partials, summed per key, with the loud
    * over-retraction guard in-plan. */
  private def foldSignedAgg(state: DataFrame, delta: DataFrame,
                            deletes: DataFrame, keyCol: String,
                            valCol: String): DataFrame = {
    val retract = aggPartials(deletes, keyCol, valCol)
      .select(col(keyCol), (-col("cnt")).as("cnt"),
        (-col("total")).cast(DecimalType(18, 2)).as("total"))
    state
      .unionByName(aggPartials(delta, keyCol, valCol))
      .unionByName(retract)
      .groupBy(col(keyCol))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).cast(DecimalType(18, 2)).as("total"))
      .withColumn("cnt",
        when(col("cnt") < 0 ||
          (col("cnt") === 0 && col("total") =!= lit(0).cast(DecimalType(18, 2))),
          raise_error(concat(
            lit("aggregate retraction exceeds the held rows for key "),
            col(keyCol).cast("string"),
            lit(" — deletes must be previously-inserted row images"))))
          .otherwise(col("cnt")))
      .filter(col("cnt") > 0)
  }

  /** The CDC-foldable persisted form of [[writeAggState]]: the same
    * (key, cnt, total) partials, but under the meta'd single-state
    * layout (`$dir/state` + kind + commit marker) that
    * [[foldAggStateWithDeletes]]'s in-place refresh and its streaming
    * twin (`StreamOps.maintainAggCdcStream`) need — a delete-bearing
    * fold REPLACES state rather than accreting batch partials, so it
    * must swap durably and carry the replay marker, exactly the
    * [[writeTopKSlackState]] shape. `dir` must hold nothing but this
    * state (checkpoints beside, never inside — the swap replaces the
    * whole directory). */
  def writeAggCdcState(df: DataFrame, keyCol: String, valCol: String,
                       dir: String): Unit = {
    aggPartials(df, keyCol, valCol)
      .write.mode("overwrite").parquet(s"$dir/state")
    Dedup.writeMeta(df.sparkSession, dir, Map("kind" -> "agg_cdc"))
  }

  private def requireAggCdcState(meta: Map[String, String],
                                 dir: String): Unit =
    require(meta.get("kind").contains("agg_cdc"),
      s"$dir is not CDC aggregate state (kind=${meta.get("kind")}) — " +
        "write it with writeAggCdcState")

  /** Fold one (delta, deletes) refresh into the stored aggregate state
    * IN PLACE — [[foldTopKSlackState]]'s shape for the count/sum leg:
    * the signed fold ([[mergeAggStateWithDeletes]]'s exact argument —
    * count and sum are distributive over signed contributions, so
    * deletes need zero extra state and the result is EXACT), then
    * state + metadata + marker swap as ONE directory. Replay contract:
    * pass `batchId` and a batch ≤ the durable marker skips outright; a
    * torn fold left the OLD state intact (the swap is all-or-nothing),
    * so the replay re-folds byte-identically. Over-retraction raises
    * in-plan during the fold, leaving the state untouched. */
  def foldAggStateWithDeletes(spark: SparkSession, dir: String,
                              delta: DataFrame, deletes: DataFrame,
                              keyCol: String, valCol: String,
                              batchId: Option[Long] = None): Unit = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    requireAggCdcState(meta, dir)
    if (batchId.exists(_ <= Dedup.lastCommittedBatch(meta))) return
    val (folded, release) = Dedup.materializeTracked(
      foldSignedAgg(Dedup.readPq(spark, s"$root/state"), delta, deletes,
        keyCol, valCol))
    try {
      Dedup.swapInDir(spark, dir) { tmp =>
        folded.write.mode("overwrite").parquet(s"$tmp/state")
        Dedup.writeMeta(spark, tmp,
          meta ++ batchId.map(b => "last_committed_batch" -> b.toString))
      }
    } finally release()
  }

  /** The served aggregate from CDC state: the state rows ARE the
    * result (every fold leaves them fully merged per key). */
  def readAggCdcState(spark: SparkSession, dir: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    requireAggCdcState(meta, dir)
    Dedup.readPq(spark, s"$root/state")
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
    val base = Dedup.readPq(spark, s"$dir/base")
    val batchesPath = new org.apache.hadoop.fs.Path(s"$dir/batches")
    val fs = batchesPath.getFileSystem(spark.sessionState.newHadoopConf())
    val all =
      if (fs.exists(batchesPath))
        base.unionByName(
          Dedup.readPq(spark, s"$dir/batches").drop("ingest_batch"))
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
    Dedup.readPq(spark, dir)
      .unionByName(delta.groupBy(col(keyCol))
        .agg(hll_sketch_agg(col(valCol)).as("hll")))
      .groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("est"))

  /** Quantile maintenance — the third leg of the triad (count/sum
    * partials, HLL distinct state, and now rank statistics). Quantiles
    * are not distributive, but per-(key, bin) HISTOGRAM COUNTS over a
    * fixed value domain are: refresh folds delta bin counts into stored
    * ones (plain integer addition — associative, commutative, any delta
    * split lands on identical state), and the interpolated quantile
    * estimate is a deterministic function of the state, so the whole
    * path replays HASH-EXACT in an external oracle — no tolerance gate
    * needed, which a KLL/t-digest sketch could not offer (and a typed
    * KLL Aggregator would pay per-row sketch (de)serialization in
    * partial aggregation). The trade: the domain [lo, hi) is fixed at
    * state creation (out-of-range values clamp to the edge bins) and
    * error is bounded by bin width — right for warehouse metrics with
    * known ranges; reach for a mergeable KLL sketch when the domain is
    * genuinely open. State size: |keys| × ≤ bins rows. */
  private def binCol(v: Column, lo: Double, w: Double, bins: Int): Column =
    least(lit(bins - 1), greatest(lit(0),
      floor((v.cast("double") - lo) / w).cast("int")))

  def writeQuantileState(df: DataFrame, keyCol: String, valCol: String,
                         dir: String, lo: Double, hi: Double,
                         bins: Int = 64): Unit = {
    require(bins >= 2, s"writeQuantileState: bins must be >= 2, got $bins")
    require(hi > lo, s"writeQuantileState: need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / bins
    df.groupBy(col(keyCol), binCol(col(valCol), lo, w, bins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$dir/state")
    Dedup.writeMeta(df.sparkSession, dir, Map(
      "kind" -> "quantile_hist", "q_lo" -> lo.toString,
      "q_hi" -> hi.toString, "q_bins" -> bins.toString))
  }

  /** Refreshed histogram state = stored bin counts ∪ delta bin counts
    * (binned with the STORED domain — the metadata is the contract),
    * folded per (key, bin). Chains like [[mergeAggState]]. */
  def mergeQuantileState(spark: SparkSession, dir: String, delta: DataFrame,
                         keyCol: String, valCol: String): DataFrame = {
    // partials first: its meta check turns a wrong-kind dir into a loud
    // refusal instead of a missing-path read error
    val deltaPartials =
      quantileDeltaPartials(spark, dir, delta, keyCol, valCol)
    Dedup.readPq(spark, s"${Dedup.indexRoot(spark, dir)}/state")
      .unionByName(deltaPartials)
      .groupBy(col(keyCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Deletion-aware histogram refresh — [[mergeAggStateWithDeletes]]'s
    * twin for the quantile leg: a deleted row's value re-bins (stored
    * domain, deterministic) to exactly the bin its insert incremented,
    * so the retraction is a negative bin count and the refreshed
    * histogram is EXACT under deletes. Same loud contract: a bin
    * driven negative raises; zeroed bins drop. */
  def mergeQuantileStateWithDeletes(spark: SparkSession, dir: String,
                                    delta: DataFrame, deletes: DataFrame,
                                    keyCol: String,
                                    valCol: String): DataFrame = {
    val retract = quantileDeltaPartials(spark, dir, deletes, keyCol, valCol)
      .select(col(keyCol), col("bin"), (-col("cnt")).as("cnt"))
    mergeQuantileState(spark, dir, delta, keyCol, valCol)
      .unionByName(retract)
      .groupBy(col(keyCol), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("cnt",
        when(col("cnt") < 0,
          raise_error(concat(
            lit("histogram retraction exceeds the held rows for key "),
            col(keyCol).cast("string"),
            lit(" — deletes must be previously-inserted row images"))))
          .otherwise(col("cnt")))
      .filter(col("cnt") > 0)
  }

  /** Fold one (delta, deletes) refresh into the stored histogram state
    * IN PLACE — the quantile twin of [[foldAggStateWithDeletes]],
    * consuming a real CDC feed where the read-only
    * [[mergeQuantileStateWithDeletes]] only computes: the signed bin
    * fold (delete rows re-bin deterministically under the STORED
    * domain to exactly the bins their inserts incremented), then
    * state + metadata + marker swap as ONE directory. [[writeQuantileState]]
    * already lays the state out in the required meta'd form, but the
    * fold swaps `dir` wholesale — so a CDC-folded quantile state must
    * live in its own directory (checkpoints beside, never inside), and
    * cannot share a directory with `maintainQuantileStream`'s
    * accreting `batches/` partitions. Same replay contract as the agg
    * fold: batch ≤ marker skips; a torn fold left the old state
    * intact; a driven-negative bin raises in-plan, state untouched. */
  def foldQuantileStateWithDeletes(spark: SparkSession, dir: String,
                                   delta: DataFrame, deletes: DataFrame,
                                   keyCol: String, valCol: String,
                                   batchId: Option[Long] = None): Unit = {
    val meta = Dedup.readMeta(spark, Dedup.indexRoot(spark, dir))
    require(meta.get("kind").contains("quantile_hist"),
      s"$dir is not quantile-histogram state (kind=${meta.get("kind")})")
    if (batchId.exists(_ <= Dedup.lastCommittedBatch(meta))) return
    val (folded, release) = Dedup.materializeTracked(
      mergeQuantileStateWithDeletes(spark, dir, delta, deletes,
        keyCol, valCol))
    try {
      Dedup.swapInDir(spark, dir) { tmp =>
        folded.write.mode("overwrite").parquet(s"$tmp/state")
        Dedup.writeMeta(spark, tmp,
          meta ++ batchId.map(b => "last_committed_batch" -> b.toString))
      }
    } finally release()
  }

  /** The CDC-folded histogram state rows (key, bin, cnt) with the
    * kind guard — feed them to [[estimateQuantiles]] with the domain
    * from [[readQuantileDomain]]. */
  def readQuantileState(spark: SparkSession, dir: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    require(meta.get("kind").contains("quantile_hist"),
      s"$dir is not quantile-histogram state (kind=${meta.get("kind")})")
    Dedup.readPq(spark, s"$root/state")
  }

  /** The (lo, hi, bins) domain a quantile state was created with — the
    * binning contract every fold and estimate must share. */
  def readQuantileDomain(spark: SparkSession,
                         dir: String): (Double, Double, Int) = {
    val meta = Dedup.readMeta(spark, Dedup.indexRoot(spark, dir))
    require(meta.get("kind").contains("quantile_hist"),
      s"$dir is not quantile-histogram state (kind=${meta.get("kind")})")
    (meta("q_lo").toDouble, meta("q_hi").toDouble, meta("q_bins").toInt)
  }

  /** One delta's bin-count partials under the STORED domain — the
    * per-micro-batch body of `StreamOps.maintainQuantileStream`, and the
    * delta leg of [[mergeQuantileState]]. */
  private[graft] def quantileDeltaPartials(spark: SparkSession, dir: String,
                                           delta: DataFrame, keyCol: String,
                                           valCol: String): DataFrame = {
    val meta = Dedup.readMeta(spark, Dedup.indexRoot(spark, dir))
    require(meta.get("kind").contains("quantile_hist"),
      s"$dir is not quantile-histogram state (kind=${meta.get("kind")})")
    val (lo, hi, bins) = (meta("q_lo").toDouble, meta("q_hi").toDouble,
      meta("q_bins").toInt)
    val w = (hi - lo) / bins
    delta.groupBy(col(keyCol), binCol(col(valCol), lo, w, bins).as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming-refresh read side, mirroring [[readAggRefreshed]]: base
    * state ∪ every committed micro-batch's bin partials (written by
    * `StreamOps.maintainQuantileStream` into `ingest_batch=<id>`
    * overwrite partitions — replay rewrites identical partials, never
    * double-folds), folded per (key, bin). */
  def readQuantileRefreshed(spark: SparkSession, dir: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    require(meta.get("kind").contains("quantile_hist"),
      s"$dir is not quantile-histogram state (kind=${meta.get("kind")})")
    val base = Dedup.readPq(spark, s"$root/state")
    val batchesPath = new org.apache.hadoop.fs.Path(s"$dir/batches")
    val fs = batchesPath.getFileSystem(spark.sessionState.newHadoopConf())
    val all =
      if (fs.exists(batchesPath))
        base.unionByName(
          Dedup.readPq(spark, s"$dir/batches").drop("ingest_batch"))
      else base
    all.groupBy(all.columns.filterNot(Set("cnt", "bin")).map(col) :+
        col("bin"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Interpolated quantiles from histogram state: per key and
    * probability p, the continuous rank r = p·n lands in the first bin
    * whose cumulative count reaches it; the estimate interpolates
    * linearly inside that bin. Every step (bin cumsum window over ≤ bins
    * rows per key, double arithmetic) is deterministic and
    * engine-replayable. Returns (key, p, n, est). */
  def estimateQuantiles(state: DataFrame, keyCol: String,
                        probs: Seq[Double], lo: Double, hi: Double,
                        bins: Int): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      s"estimateQuantiles: probs must be in (0,1), got $probs")
    val w = (hi - lo) / bins
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy("bin")
    val cum = state
      .withColumn("cum", sum(col("cnt")).over(win))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCol)))
    probs.map { p =>
      cum.withColumn("r", lit(p) * col("n").cast("double"))
        .filter(col("cum").cast("double") >= col("r") &&
          (col("cum") - col("cnt")).cast("double") < col("r"))
        .select(col(keyCol), lit(p).as("p"), col("n").cast("long").as("n"),
          round(lit(lo) + lit(w) * (col("bin").cast("double") +
            (col("r") - (col("cum") - col("cnt")).cast("double")) /
              col("cnt").cast("double")), 6).as("est"))
    }.reduce(_ unionByName _)
  }

  /** Top-k maintenance — the fourth leg (count/sum, HLL distinct,
    * histogram quantiles, and now ranked leaderboards). Under
    * APPEND-ONLY deltas, per-group top-k is exactly maintainable from
    * k-bounded state: every row of topk(base ∪ delta) is either already
    * in topk(base) or arrives in the delta (a base row outside the old
    * top-k can never re-enter — appends only push scores UP the
    * leaderboard). So the state is just the current top-k rows per
    * group (≤ |groups| × k rows, corpus-independent), the refresh scans
    * state + delta only, and the result is EXACT, not approximate —
    * hash-gated against the one-shot recompute. Deletions void the
    * argument (a removed leader exposes row k+1, which the state no
    * longer holds); that is a documented contract, enforced nowhere
    * cheaper than here. */
  def writeTopKState(df: DataFrame, keyCol: String, idCol: String,
                     scoreCol: String, k: Int, dir: String): Unit = {
    require(k >= 1, s"writeTopKState: k must be >= 1, got $k")
    TopK.topKPerGroup(df.select(col(keyCol), col(idCol), col(scoreCol)),
        keyCol, idCol, scoreCol, k)
      .drop("rk")
      .write.mode("overwrite").parquet(s"$dir/state")
    Dedup.writeMeta(df.sparkSession, dir, Map(
      "kind" -> "topk", "topk_k" -> k.toString))
  }

  /** Refreshed leaderboard = topk(stored top-k rows ∪ delta rows) per
    * group, through the same bounded [[TopK.TopKAgg]] buffer — only k
    * rows per group per map partition cross the shuffle, and the union
    * input is |state| + |delta|, never the base. Chains: fold delta 1,
    * write, fold delta 2 ≡ one-shot over base ∪ both (set union is
    * associative and the top-k of a union depends only on the operands'
    * top-k's). Returns (key, id, score, rk) in the gate's total order
    * (score desc, id asc). */
  def mergeTopKState(spark: SparkSession, dir: String, delta: DataFrame,
                     keyCol: String, idCol: String,
                     scoreCol: String): DataFrame = {
    val meta = Dedup.readMeta(spark, dir)
    require(meta.get("kind").contains("topk"),
      s"$dir is not top-k state (kind=${meta.get("kind")})")
    val k = meta("topk_k").toInt
    val state = Dedup.readPq(spark, s"$dir/state")
    TopK.topKPerGroup(
      state.unionByName(
        delta.select(col(keyCol), col(idCol),
          col(scoreCol).cast("double").as(scoreCol))),
      keyCol, idCol, scoreCol, k)
  }

  /** One delta's k-bounded leaderboard partials under the STORED k —
    * the per-micro-batch body of `StreamOps.maintainTopKStream`. Top-k
    * of a union depends only on the operands' top-k's, so a batch's
    * top-k rows ARE its mergeable partial (≤ |groups| × k rows). */
  private[graft] def topKDeltaPartials(spark: SparkSession, dir: String,
                                       delta: DataFrame, keyCol: String,
                                       idCol: String,
                                       scoreCol: String): DataFrame = {
    val meta = Dedup.readMeta(spark, dir)
    require(meta.get("kind").contains("topk"),
      s"$dir is not top-k state (kind=${meta.get("kind")})")
    TopK.topKPerGroup(
      delta.select(col(keyCol), col(idCol), col(scoreCol)),
      keyCol, idCol, scoreCol, meta("topk_k").toInt).drop("rk")
  }

  /** Streaming-refresh read side, mirroring [[readAggRefreshed]] /
    * [[readQuantileRefreshed]]: base top-k state ∪ every committed
    * micro-batch's top-k partials (each an `ingest_batch=<id>`
    * overwrite partition — replay rewrites identical rows, never
    * double-counts), re-cut to k per group. The fold input is
    * |state| + Σ|batch partials| rows, every term k-bounded. */
  def readTopKRefreshed(spark: SparkSession, dir: String, keyCol: String,
                        idCol: String, scoreCol: String): DataFrame = {
    val meta = Dedup.readMeta(spark, dir)
    require(meta.get("kind").contains("topk"),
      s"$dir is not top-k state (kind=${meta.get("kind")})")
    val base = Dedup.readPq(spark, s"$dir/state")
    val batchesPath = new org.apache.hadoop.fs.Path(s"$dir/batches")
    val fs = batchesPath.getFileSystem(spark.sessionState.newHadoopConf())
    val all =
      if (fs.exists(batchesPath))
        base.unionByName(
          Dedup.readPq(spark, s"$dir/batches").drop("ingest_batch"))
      else base
    TopK.topKPerGroup(all, keyCol, idCol, scoreCol, meta("topk_k").toInt)
  }

  /** Deletion-aware top-k maintenance — closes the one leg the
    * append-only [[writeTopKState]] contract (correctly) refuses: a
    * deleted leader exposes rank k+1, which k-bounded state no longer
    * holds. The fix is k+slack state plus an explicit per-group depth
    * ledger, with a LOUD refusal once deletions eat the slack:
    *
    *  - `state/` holds the true top-D_g rows per group (D_g the
    *    group's current valid depth, initially min(|group|, k+slack));
    *  - `caps/` holds (key, depth) — depth NULL means the state holds
    *    the ENTIRE group ("complete": every delete is visible, the
    *    board can never silently go stale);
    *  - a tombstone that hits the stored board decrements depth (the
    *    surviving rows are still the true top of the live corpus); a
    *    tombstone below the horizon cannot touch the board by
    *    construction (the state holds every live row above it) and
    *    consumes NO slack;
    *  - appended rows fold through the bounded top-k cut and never
    *    shrink depth — but they cannot REGROW it either (a new row
    *    below the stored floor is incomparable with unseen corpus
    *    rows), so depth is monotone until a rebuild;
    *  - the moment any group's depth would fall below k, the fold (and
    *    every later serve) raises in-plan instead of serving a board
    *    whose tail might be wrong: slack exhaustion is an ERROR with a
    *    rebuild instruction, never a silent approximation.
    *
    * Refresh cost is |state| + |delta| + |tombstones| — the Maintain
    * family law, corpus-independent. */
  def writeTopKSlackState(df: DataFrame, keyCol: String, idCol: String,
                          scoreCol: String, k: Int, slack: Int,
                          dir: String): Unit = {
    require(k >= 1, s"writeTopKSlackState: k must be >= 1, got $k")
    require(slack >= 1, s"writeTopKSlackState: slack must be >= 1, got $slack")
    val cap = k + slack
    val rows = df.select(col(keyCol), col(idCol),
      col(scoreCol).cast("double").as(scoreCol))
    TopK.topKPerGroup(rows, keyCol, idCol, scoreCol, cap).drop("rk")
      .write.mode("overwrite").parquet(s"$dir/state")
    rows.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .select(col(keyCol),
        when(col("__n") > cap, lit(cap.toLong)).as("depth"))
      .write.mode("overwrite").parquet(s"$dir/caps")
    Dedup.writeMeta(df.sparkSession, dir, Map(
      "kind" -> "topk_slack", "topk_k" -> k.toString,
      "topk_slack" -> slack.toString))
  }

  private def requireSlackState(meta: Map[String, String],
                                dir: String): (Int, Int) = {
    require(meta.get("kind").contains("topk_slack"),
      s"$dir is not slack top-k state (kind=${meta.get("kind")})")
    (meta("topk_k").toInt, meta("topk_slack").toInt)
  }

  /** In-plan slack guard: a non-complete depth below k raises with the
    * offending group named. */
  private def guardDepth(depth: Column, keyCol: String, k: Int): Column =
    when(depth.isNotNull && depth < k,
      raise_error(concat(
        lit(s"top-k slack exhausted (depth < k=$k) for group "),
        col(keyCol).cast("string"),
        lit(" — deletions ate the slack; rebuild the state from the " +
          "base corpus with writeTopKSlackState"))))
      .otherwise(depth)

  /** Fold one (delta, tombstones) refresh into the stored state IN
    * PLACE: rewrites `caps/` and `state/`, refusing loudly if any
    * group's depth falls below k. `deletes` carries (keyCol, idCol)
    * tombstones; duplicates and tombstones for unseen/nonexistent ids
    * are harmless. Folds chain (depth bookkeeping composes), so a
    * daily delete-bearing refresh stays state+delta-bounded.
    *
    * The fold replaces the state DIRECTORY wholesale (sibling swap),
    * so `dir` must hold nothing but this state — keep checkpoints and
    * staging data beside it, never inside it.
    *
    * Replay contract (the streaming twin's backbone): pass `batchId`
    * and a batch ≤ the durable `last_committed_batch` marker skips
    * outright; the marker commits atomically with the swap — caps,
    * state and marker land together or not at all, so replays see
    * either the whole previous fold or none of it. The crash windows
    * are [[Dedup.swapInDir]]'s: a crash mid-build leaves the old state
    * intact (the replay re-folds from it, byte-identically), and a
    * crash inside the delete+rename instant leaves the state loudly
    * unreadable — repairable with [[Dedup.recoverSwap]], never a
    * readable caps-new/state-old mix. (An id re-ingested
    * with a DIFFERENT score is a caller contract violation, as
    * documented on [[writeTopKSlackState]] — model updates as
    * delete + insert.) */
  def foldTopKSlackState(spark: SparkSession, dir: String, delta: DataFrame,
                         deletes: DataFrame, keyCol: String, idCol: String,
                         scoreCol: String,
                         batchId: Option[Long] = None): Unit = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    val (k, slack) = requireSlackState(meta, dir)
    if (batchId.exists(_ <= Dedup.lastCommittedBatch(meta))) return
    val cap = k + slack
    val state = Dedup.readPq(spark, s"$root/state")
    val caps = Dedup.readPq(spark, s"$root/caps")
    val tomb = deletes.select(col(keyCol), col(idCol)).distinct()
    val live = state.join(tomb, Seq(keyCol, idCol), "left_anti")
    val hits = state.join(tomb, Seq(keyCol, idCol), "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__hits"))
    val union = live.unionByName(delta.select(col(keyCol), col(idCol),
      col(scoreCol).cast("double").as(scoreCol)))
      .dropDuplicates(keyCol, idCol, scoreCol)
    val cut = TopK.topKPerGroup(union, keyCol, idCol, scoreCol, cap)
    val unionSizes = union.groupBy(col(keyCol)).agg(count(lit(1)).as("__un"))
    // per-group depth transition: complete (null) stays complete until
    // the group outgrows cap; incomplete shrinks by the board hits;
    // delta-born groups (no caps row) are complete unless already > cap
    // full outer: a group whose stored rows are ALL tombstoned has no
    // union rows, but its ledger entry must survive to raise (an
    // incomplete group wiped from the board still has unseen live rows
    // below the horizon — dropping it silently would serve staleness)
    val newCaps = caps.join(unionSizes, Seq(keyCol), "full_outer")
      .join(hits, Seq(keyCol), "left")
      .select(col(keyCol),
        guardDepth(
          when(col("depth").isNotNull,
            col("depth") - coalesce(col("__hits"), lit(0L)))
            .otherwise(
              when(coalesce(col("__un"), lit(0L)) > cap, lit(cap.toLong))),
          keyCol, k).as("depth"))
    val newState = cut.join(newCaps, Seq(keyCol), "left")
      .filter(col("depth").isNull || col("rk") <= col("depth"))
      .select(col(keyCol), col(idCol), col(scoreCol))
    // materialize (the plans read the files being replaced), then swap
    // state + caps + marker as ONE directory: per-table overwrites
    // leave a readable caps-new/state-old window in which a reader
    // would serve tombstoned leaders with a passing depth guard — the
    // directory swap's only crash window is loudly unreadable instead
    val (ns, relS) = Dedup.materializeTracked(newState)
    val (nc, relC) = Dedup.materializeTracked(newCaps)
    try {
      Dedup.swapInDir(spark, dir) { tmp =>
        nc.write.mode("overwrite").parquet(s"$tmp/caps")
        ns.write.mode("overwrite").parquet(s"$tmp/state")
        Dedup.writeMeta(spark, tmp,
          meta ++ batchId.map(b => "last_committed_batch" -> b.toString))
      }
    } finally { relS(); relC() }
  }

  /** The served leaderboard: top-k per group from the stored rows, in
    * the gate's total order — guarded by the same depth refusal, so a
    * state written by an older engine version (or tampered caps) can
    * never serve a silently-stale board. */
  def serveTopKSlack(spark: SparkSession, dir: String, keyCol: String,
                     idCol: String, scoreCol: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    val (k, _) = requireSlackState(meta, dir)
    val board = TopK.topKPerGroup(Dedup.readPq(spark, s"$root/state"),
      keyCol, idCol, scoreCol, k)
    board.join(Dedup.readPq(spark, s"$root/caps"), Seq(keyCol), "left")
      .withColumn("__d", guardDepth(col("depth"), keyCol, k))
      // tautological by construction (guardDepth already raised for
      // any depth < k) — its job is to REFERENCE __d so Catalyst
      // cannot prune the unevaluated guard column away
      .filter(col("__d").isNull || col("__d") >= k)
      .drop("depth", "__d")
  }

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
