package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted (probability-proportional-to-size) corpus sampling and the
  * scalable exclusive prefix sum it rides on.
  *
  * The prefix sum is the two-phase form factored out of sequence packing
  * (see [[TextOps.packOffsets]], which delegates here): the naive
  * `SUM OVER (ORDER BY id)` window makes ONE task sort the corpus, so
  * instead — per-bucket totals (bucket = id div bucketSize,
  * deterministic), a driver-side running sum over the tiny bucket-total
  * table, and a within-bucket window bounded by bucketSize rows. Exact
  * integer math end to end: the result is bit-identical to the
  * single-window oracle for EVERY bucketing.
  *
  * Sampling then inverts the weight CDF at m deterministic points:
  * p_j = md5("tag:j") mod W. Each document owns the half-open interval
  * [start, start + w) of the concatenated weight line, so point j
  * selects exactly one document, with probability proportional to its
  * weight — sampling WITH replacement (a mega-document can absorb
  * several points), the standard PPS draw for mixing corpora by token
  * budget. The points are a broadcast of m rows ranged-joined against
  * the offsets: one corpus scan, no extra shuffle beyond the prefix
  * sum, and — because the points are md5-derived, not rand() — the
  * sample is reproducible across engines, partitionings and reruns,
  * which is what makes a DuckDB oracle possible.
  */
object Sampling {

  /** Auto-sizing target for the driver-side running sum: one (bucket,
    * total) tuple per occupied bucket, so ~100k buckets keeps that step
    * a few MB at any corpus size. */
  val TargetBuckets = 100000L

  /** Exclusive prefix sum of `wCol` (integer) in `idCol` order:
    * returns (idCol long, wCol long, start long). Requires non-null
    * numeric ids — fails loudly otherwise, because a null id would
    * otherwise surface as an opaque NPE in the bucket-total pull.
    *
    * `bucketSize = 0` auto-scales from the observed id span to target
    * ≤ [[TargetBuckets]] occupied buckets (floor 4096); the result is
    * invariant to the sizing (law in `OperatorsSpec` /
    * `SamplingSpec`), so auto vs explicit only moves work, never rows. */
  def exclusiveOffsets(df: DataFrame, idCol: String, wCol: String,
                       bucketSize: Long = 0L): DataFrame = {
    require(bucketSize >= 0)
    val spark = df.sparkSession
    val t = df.select(col(idCol).cast("long").as(idCol),
      col(wCol).cast("long").as(wCol))
    val counted0 = Dedup.materialize(t)
    // count(when(...)), not sum(when(...)): SUM over zero rows is NULL,
    // so the sum form NPEs on an EMPTY input before reaching the
    // empty-handling branch below — count is 0 on no rows
    val s0 = counted0.agg(
      count(when(col(idCol).isNull, lit(1))).as("n_null"),
      min(idCol).as("lo"), max(idCol).as("hi")).head()
    require(s0.getLong(0) == 0L,
      s"exclusiveOffsets: ${s0.getLong(0)} rows have a null/non-numeric " +
        s"'$idCol' — a numeric, non-null id is required for the offset order")
    val bs =
      if (bucketSize > 0L) bucketSize
      else if (s0.isNullAt(1)) 4096L // empty input: any sizing works
      else {
        val span = s0.getLong(2) - s0.getLong(1) + 1L
        math.max(4096L, span / TargetBuckets + 1L)
      }
    val counted = counted0.withColumn("bucket", expr(s"$idCol div ${bs}L"))
    val bucketTotals = counted.groupBy("bucket")
      .agg(sum(wCol).as("bsum"))
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exclusive running sum over bucket totals — the only driver-side
    // step, bounded by the bucket count, never by rows
    val offsets = bucketTotals.scanLeft((0L, 0L)) {
      case ((_, acc), (b, s)) => (b, acc + s)
    }.tail.zip(bucketTotals).map { case ((b, after), (_, s)) =>
      (b, after - s)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("bucket", "boffset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    counted.join(broadcast(offDf), Seq("bucket"))
      .withColumn("start",
        coalesce(sum(col(wCol)).over(w), lit(0L)) + col("boffset"))
      .select(col(idCol), col(wCol), col("start"))
  }

  /** m-point PPS sample: (sample_idx int, idCol, wCol), one row per
    * point, each point landing on the document whose weight interval
    * contains it. Zero-weight rows are never sampled (their interval is
    * empty); duplicate draws of one heavy document are expected — this
    * is with-replacement PPS. Deterministic in (`seedTag`, m, data). */
  def weightedSample(df: DataFrame, idCol: String, wCol: String, m: Int,
                     seedTag: String = "wsmp"): DataFrame = {
    require(m > 0, s"weightedSample: m must be positive, got $m")
    val spark = df.sparkSession
    val offs = exclusiveOffsets(df, idCol, wCol)
    val total = offs.agg(coalesce(sum(col(wCol)), lit(0L)).as("__wt"))
    // m is user-bounded and tiny vs the corpus: build the points as a
    // 1-row-frame cross (total weight) over a range, broadcast them, and
    // range-join against the offsets — a single corpus scan, no shuffle
    val pts = spark.range(m.toLong)
      .select(col("id").cast("int").as("sample_idx"))
      .crossJoin(total)
      .select(col("sample_idx"),
        (Dedup.md5Hash60(concat(lit(s"$seedTag:"),
          col("sample_idx").cast("string"))) % col("__wt")).as("__p"))
    broadcast(pts).join(offs,
        pts("__p") >= offs("start") && pts("__p") < offs("start") + offs(wCol))
      .select(col("sample_idx"), col(idCol), col(wCol))
  }

  /** Temperature-scaled domain mixing — the multilingual-pretraining
    * rebalance: sample the corpus toward the T=2 (square-root) mixture,
    * where domain d's share of an m-document budget is
    * √n_d / Σ_e √n_e instead of its natural n_d / N. Common domains
    * are thinned; RARE domains can be oversampled past 1 epoch, so the
    * result is a per-document COPY COUNT, not a filter:
    * (id, domain, n_copies) with
    *
    *   rate_d   = m·√n_d / (Σ_e √n_e) / n_d      (expected copies/doc)
    *   n_copies = ⌊rate_d⌋ + [md5₆₀("tmix:id") < frac(rate_d)·2⁶⁰]
    *
    * The md5 draw makes the fractional epoch deterministic per
    * document (reproducible across engines/partitionings — no RNG),
    * and Σ n_copies concentrates tightly around m.
    *
    * Determinism across engines: √ via `sqrt` (IEEE-correctly rounded
    * in both the JVM and DuckDB — NOT `pow(x, 0.5)`, which no libm
    * promises), divisions in one fixed association order, and the
    * fractional test as an integer compare against ⌊frac·2⁶⁰⌋.
    * Generalizing the temperature means swapping `sqrt` for
    * `pow(n, 1/T)` and accepting libm drift in the oracle, or
    * precomputing the G rates driver-side in exact arithmetic.
    *
    * Scale: one partial-aggregated count shuffle over the domain key
    * (G rows out), a 1-row frame combine for the normalizer, and an
    * unhinted G-row join back to the scan — the rate table is bounded
    * by the DOMAIN count, metadata at any corpus size. */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     m: Long, seedTag: String = "tmix"): DataFrame = {
    require(m > 0, s"temperatureMix: budget m must be positive, got $m")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__nd"))
      .withColumn("__w", sqrt(col("__nd").cast("double")))
    val norm = counts.agg(sum(col("__w")).as("__wsum"))
    val rates = counts.crossJoin(norm) // 1-row frame combine
      .withColumn("__rate",
        lit(m.toDouble) * col("__w") / col("__wsum") / col("__nd"))
      .select(col("__dom"), floor(col("__rate")).cast("long").as("__base"),
        floor((col("__rate") - floor(col("__rate"))) *
          lit(1152921504606846976.0)).cast("long").as("__thr"))
    df.select(col(idCol), col(domainCol))
      .join(rates, col(domainCol) === col("__dom"))
      .withColumn("n_copies", col("__base") +
        when(Dedup.md5Hash60(concat(lit(s"$seedTag:"),
          col(idCol).cast("string"))) < col("__thr"), 1L).otherwise(0L))
      .select(col(idCol), col(domainCol), col("n_copies"))
  }

  /** Exact proportional stratified sample: from every stratum, the
    * ⌈num·n_s/den⌉ documents with the smallest md5 draw (ties broken by
    * id — impossible anyway for distinct ids). The fraction is a
    * RATIONAL num/den so the per-stratum allocation is pure integer
    * math — `(num·n_s + den − 1) div den` — bit-identical in any
    * engine; a double `frac` would make ⌈frac·n_s⌉ hostage to the last
    * ulp of one multiply.
    *
    * The within-stratum rank is computed WITHOUT a per-stratum global
    * window (a handful of strata over 100 TB = a handful of reducers
    * sorting everything): `repartitionByRange` on (stratum, hash, id)
    * gives partition-local sorted runs, per-(partition, stratum) counts
    * — a metadata table bounded by partitions + strata, collected to
    * the driver — turn local row_numbers into exact global
    * within-stratum ranks, same machinery as
    * [[EntityRes.sortedNeighborhoodPairs]]' global rank. The rank is
    * invariant to where the sampled range boundaries fall.
    *
    * Strata must be CATEGORICAL (statuses, languages, sources): the
    * driver-side count table is the scale guard, and a high-cardinality
    * stratum column fails loudly rather than silently shipping a
    * rows-sized table. Returns the sampled (idCol, strataCol) pairs —
    * join back on the id for payload columns. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       num: Int, den: Int,
                       seedTag: String = "strat"): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"stratifiedSample: need 0 < num/den <= 1, got $num/$den")
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val t = df.select(col(strataCol).cast("string").as("__st"),
      col(idCol).cast("long").as("__id"))
    val bad = t.agg(count(when(col("__st").isNull || col("__id").isNull,
      lit(1)))).head().getLong(0)
    require(bad == 0L,
      s"stratifiedSample: $bad rows have a null '$strataCol'/'$idCol' — " +
        "the allocation needs both")
    val sorted = Dedup.materialize(
      t.withColumn("__h", Dedup.md5Hash32(
          concat(lit(s"$seedTag:"), col("__id").cast("string"))))
        .repartitionByRange(nPart, col("__st"), col("__h"), col("__id"))
        .sortWithinPartitions("__st", "__h", "__id")
        .withColumn("__pid", spark_partition_id()))
    val counts = sorted.groupBy("__pid", "__st")
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    require(counts.length <= 4 * nPart + 100000,
      s"stratifiedSample: ${counts.length} (partition, stratum) groups — " +
        s"'$strataCol' looks high-cardinality; stratified sampling wants " +
        "a categorical stratum (use hash sampling for per-row draws)")
    // per-stratum exclusive offsets in (pid) order + per-stratum totals
    // — driver-side over the bounded count table only
    val offRows = partitionOffsetsByKey(counts.toSeq)
    import spark.implicits._
    val offDf = offRows.toDF("__pid", "__st", "__off", "__n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid", "__st").orderBy("__h", "__id")
    sorted.join(broadcast(offDf), Seq("__pid", "__st"))
      .withColumn("__rk",
        row_number().over(w).cast("long") + col("__off"))
      .filter(col("__rk") <=
        expr(s"(__n * ${num}L + ${den - 1}L) div ${den}L"))
      .select(col("__id").as(idCol), col("__st").as(strataCol))
  }

  /** Driver-side second phase of the exact-global-rank machinery shared
    * by [[stratifiedSample]] (counting rows) and [[tokenBudgetMix]]
    * (summing tokens): turn the collected per-(partition, key) measures
    * into each key's exclusive offsets in partition order plus its
    * total. Bounded by the count table, never by rows — and ONE
    * implementation, so a fix to the offset arithmetic can't silently
    * diverge between the two ops. */
  private def partitionOffsetsByKey(
      counts: Seq[(Int, String, Long)]): Seq[(Int, String, Long, Long)] =
    counts.groupBy(_._2).iterator.flatMap { case (key, rows) =>
      val ordered = rows.sortBy(_._1)
      val offs = ordered.scanLeft(0L)(_ + _._3)
      val total = offs.last
      ordered.zip(offs).map { case ((pid, _, _), off) =>
        (pid, key, off, total)
      }
    }.toSeq

  /** Per-domain token budgets at temperature T=2 — the companion that
    * turns "give me `totalBudget` training tokens at the square-root
    * mixture" into the explicit (domain, budget) table
    * [[tokenBudgetMix]] consumes: budget_d = ⌊total·√S_d / Σ_e √S_e⌋
    * where S_d is domain d's TOKEN mass (not its document count — the
    * unit a pretraining mixture is actually specified in; a
    * doc-count mixture over-serves domains with short documents).
    * Same determinism contract as [[temperatureMix]]: `sqrt` is
    * IEEE-correctly rounded in both the JVM and DuckDB, the divisions
    * associate in ONE fixed order (total · w / wsum), and the floor
    * lands on a long — bit-identical across engines.
    *
    * Scale: one partial-aggregated shuffle on the domain key (G rows
    * out) + a 1-row frame combine — metadata at any corpus size. */
  def temperatureTokenBudgets(df: DataFrame, domainCol: String,
                              tokCol: String, totalBudget: Long): DataFrame = {
    require(totalBudget > 0,
      s"temperatureTokenBudgets: totalBudget must be positive, got $totalBudget")
    val c = df.groupBy(col(domainCol))
      .agg(sum(col(tokCol).cast("long")).as("__sd"))
    // same input guard as [[tokenBudgetMix]]: a negative token mass
    // (bad upstream sentinel values) would flow through sqrt as NaN
    // and surface as an opaque cast error (ANSI) or silent zeros; an
    // all-null mass would land a null budget the mix op then blames on
    // the BUDGETS table. Fail here, naming the data column. The check
    // is one action over the G-row domain aggregate.
    val bad = c.agg(count(when(col("__sd").isNull || col("__sd") < 0L,
      lit(1)))).head().getLong(0)
    require(bad == 0L,
      s"temperatureTokenBudgets: $bad domain(s) have a null or negative " +
        s"total '$tokCol' — token masses must be non-null and >= 0")
    val w = c.withColumn("__w", sqrt(col("__sd").cast("double")))
    val norm = w.agg(sum(col("__w")).as("__wsum"))
    w.crossJoin(norm) // 1-row frame combine
      .select(col(domainCol),
        floor(lit(totalBudget.toDouble) * col("__w") / col("__wsum"))
          .cast("long").as("budget"))
  }

  /** Token-budgeted mixture construction — the op a pretraining data
    * recipe is actually written in: every document gets a COPY COUNT
    * such that domain d delivers (as close as whole documents allow)
    * exactly `budget_d` tokens:
    *
    *   n_copies = budget_d div S_d                (full epochs)
    *            + [start < budget_d mod S_d]      (partial-epoch fill)
    *
    * where S_d is the domain's total token mass and `start` is the
    * document's EXCLUSIVE prefix token sum within its domain in
    * md5("tag:id")-shuffled order — so the partial epoch is a
    * deterministic pseudo-random prefix of the domain, reproducible
    * across engines/partitionings/reruns (which is what makes a DuckDB
    * oracle possible), and Σ n_copies·tok lands within one document of
    * the budget. Budgets below S_d select a subset (n_copies ∈ {0,1} —
    * the downsampling fill); budgets above S_d repeat documents (the
    * small-domain multi-epoch upsample); domains absent from `budgets`
    * get 0. This subsumes the separate "fill" and "repeat schedule"
    * ops a mixture pipeline otherwise needs.
    *
    * `budgets` is a 2-column (domain, budget) frame — pass a literal
    * table or compose with [[temperatureTokenBudgets]]; it is
    * domain-bounded metadata either way and broadcasts.
    *
    * Scale shape (the [[stratifiedSample]] exact-global-rank
    * machinery, summing tokens instead of counting rows): a
    * per-domain `SUM OVER (ORDER BY h)` window would make G reducers
    * sort the corpus — instead `repartitionByRange(domain, h, id)`
    * gives partition-local sorted runs, the per-(partition, domain)
    * token totals (a metadata table bounded by partitions × domains,
    * collected) turn local window sums into exact global prefix sums,
    * and the within-partition window is bounded by the partition. One
    * range shuffle + one window-clustering exchange of the corpus, a
    * G-row broadcast join, no global sort. Domains must be CATEGORICAL
    * — the driver-side count table is the scale guard. Returns every
    * input document: (idCol, domainCol, tokCol, tok_start, n_copies). */
  def tokenBudgetMix(df: DataFrame, idCol: String, domainCol: String,
                     tokCol: String, budgets: DataFrame,
                     seedTag: String = "tbmix"): DataFrame = {
    val spark = df.sparkSession
    require(budgets.columns.length == 2,
      s"tokenBudgetMix: budgets must be a 2-column (domain, budget) " +
        s"frame, got ${budgets.columns.mkString("(", ", ", ")")}")
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val t = df.select(col(domainCol).cast("string").as("__dom"),
      col(idCol).cast("long").as("__id"),
      col(tokCol).cast("long").as("__tok"))
    val s0 = t.agg(
      count(when(col("__dom").isNull || col("__id").isNull ||
        col("__tok").isNull, lit(1))).as("n_bad"),
      count(when(col("__tok") < 0, lit(1))).as("n_neg"),
      (count(lit(1)) - countDistinct(col("__id"))).as("n_dup")).head()
    require(s0.getLong(0) == 0L,
      s"tokenBudgetMix: ${s0.getLong(0)} rows have a null " +
        s"'$domainCol'/'$idCol'/'$tokCol' — the fill order needs all three")
    require(s0.getLong(1) == 0L,
      s"tokenBudgetMix: ${s0.getLong(1)} rows have a negative '$tokCol' — " +
        "a token count can't be negative")
    // duplicate ids share one md5 draw, so they TIE in the (__h, __id)
    // fill order — with different token counts their tok_start /
    // n_copies would depend on which tie the sort visits first,
    // breaking the op's reproducibility (and DuckDB-parity) contract.
    // Same uniqueness stance as the budgets-domain dup check above.
    require(s0.getLong(2) == 0L,
      s"tokenBudgetMix: ${s0.getLong(2)} duplicate '$idCol' value(s) — " +
        "the deterministic fill order needs distinct ids (duplicates " +
        "tie in the shuffled order and make tok_start nondeterministic)")
    val b = budgets.toDF("__bdom", "__budget")
      .select(col("__bdom").cast("string").as("__bdom"),
        col("__budget").cast("long").as("__budget"))
    val b0 = b.agg(count(when(col("__budget") < 0L ||
        col("__budget").isNull || col("__bdom").isNull, lit(1))),
      count(lit(1)) - countDistinct(col("__bdom"))).head()
    require(b0.getLong(0) == 0L,
      "tokenBudgetMix: budgets frame has null or negative entries")
    require(b0.getLong(1) == 0L,
      "tokenBudgetMix: budgets frame repeats a domain — one budget per " +
        "domain (the join back would duplicate every document in it)")
    val sorted = Dedup.materialize(
      t.withColumn("__h", Dedup.md5Hash60(
          concat(lit(s"$seedTag:"), col("__id").cast("string"))))
        .repartitionByRange(nPart, col("__dom"), col("__h"), col("__id"))
        .sortWithinPartitions("__dom", "__h", "__id")
        .withColumn("__pid", spark_partition_id()))
    val counts = sorted.groupBy("__pid", "__dom")
      .agg(sum("__tok").as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    require(counts.length <= 4 * nPart + 100000,
      s"tokenBudgetMix: ${counts.length} (partition, domain) groups — " +
        s"'$domainCol' looks high-cardinality; a mixture domain should be " +
        "categorical (languages, sources, quality tiers)")
    // per-domain exclusive token offsets in partition order + totals —
    // driver-side over the bounded count table only
    val offRows = partitionOffsetsByKey(counts.toSeq)
    import spark.implicits._
    val offDf = offRows.toDF("__pid", "__dom", "__off", "__total")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid", "__dom").orderBy("__h", "__id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    sorted.join(broadcast(offDf), Seq("__pid", "__dom"))
      .withColumn("__start",
        coalesce(sum(col("__tok")).over(w), lit(0L)) + col("__off"))
      .join(broadcast(b), col("__dom") === col("__bdom"), "left")
      .withColumn("__bud", coalesce(col("__budget"), lit(0L)))
      .withColumn("n_copies",
        when(col("__total") === 0L, lit(0L)).otherwise(
          expr("__bud div __total") +
            when(col("__start") < col("__bud") % col("__total"), lit(1L))
              .otherwise(lit(0L))))
      .select(col("__id").as(idCol), col("__dom").as(domainCol),
        col("__tok").as(tokCol), col("__start").as("tok_start"),
        col("n_copies"))
  }

  /** Deterministic seeded training-order shuffle — the assignment a
    * 100 TB export needs BEFORE [[graft.sources.Sinks.writeRangeShards]]
    * lays the bytes out: every row gets `(shard, pos)` under a
    * reproducible pseudo-random permutation keyed on
    * md5("shuffle:seed:id"), so training order is (a) statistically
    * shuffled — adjacent source rows land in unrelated shards/offsets,
    * breaking the crawl-order/domain runs an IID loss estimate can't
    * tolerate — and (b) a pure FUNCTION of (seed, id): re-running the
    * export, resuming a crashed one, or re-deriving the order on a
    * different engine yields the identical permutation (rand() gives
    * none of that), and changing the seed re-deals every epoch.
    *
    * Scale shape: shard = hash mod nShards spreads rows uniformly; pos
    * is a per-shard `row_number` ordered by (hash, id) — each shard is
    * one window partition, so size nShards to the export unit (a few
    * million rows: exactly [[graft.sources.Sinks.writeRangeShards]]'s
    * `targetRowsPerShard`) and the sort parallelism IS the shard
    * count. One shuffle total; no global sort, no single-task window.
    * The 60-bit hash keeps mod-nShards bias ≤ 2⁻²⁸ at any corpus
    * size; ties are impossible (id breaks them). */
  def seededShuffle(df: DataFrame, idCol: String, seed: Long,
                    nShards: Int): DataFrame = {
    require(nShards > 0, s"seededShuffle: nShards must be positive, " +
      s"got $nShards")
    val h = Dedup.md5Hash60(
      concat(lit(s"shuffle:$seed:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("__h", idCol)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
