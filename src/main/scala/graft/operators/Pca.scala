package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PCA over an embedding column — the standard
  * dimensionality-reduction step in front of ANN indexing and
  * clustering (centering + decorrelation makes sign-LSH planes and IVF
  * cells markedly better behaved on anisotropic embedding clouds).
  *
  * The 100 TB shape: PCA of d-dimensional vectors needs exactly TWO
  * corpus statistics — the per-dimension first moments and the d×d
  * second-moment (Gram) matrix — both distributive aggregations whose
  * result size is d²-bounded, corpus-independent. So the plan is: one
  * scan folding d(d+1)/2 upper-triangle products per row into a hash
  * aggregate keyed by (i, j) (map-side combine collapses every
  * partition to ≤ d² rows — the exploded products never cross the
  * shuffle), a driver-side Jacobi eigensolve of the d×d covariance
  * (microseconds for d ≤ a few hundred — the `.collect()` here is
  * d²-bounded, never corpus-bounded), and a scan-only projection of
  * the corpus through the resulting literal weight matrix (zero
  * shuffles, codegen'd `zip_with`/`aggregate` arithmetic).
  *
  * Exactness contract: elements are quantized to integer micro-units
  * (floor(x·10⁶ + 0.5) — the [[graft.functions.QuantExprs]] rounding,
  * which an external SQL engine replays exactly), so moments and Gram
  * sums are INTEGER sums — associative, fold-order-free, hash-gateable.
  * The eigensolve consumes doubles derived from those exact integers;
  * its outputs are gated by PCA's defining identities (orthonormality,
  * eigen-residual, the Rayleigh variance law) rather than by value
  * replay, since no external oracle carries an eigensolver. */
object Pca {

  /** Micro-unit quantization of a float/double array column:
    * floor(x·10⁶ + 0.5) per element, as longs. */
  private def microVec(vecCol: Column): Column =
    transform(vecCol,
      x => floor(x.cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))

  /** floor(sqrt(Long.MaxValue)) — the largest |q| whose square still
    * fits a long. Unit-scale embeddings sit ~10³ below it. */
  private val MaxGramElement = 3037000499L

  /** Upper-triangle second-moment sums: one row per 0 ≤ i ≤ j < d with
    * n = corpus rows and sp = Σ_rows q_i·q_j (DECIMAL(38,0) — exact at
    * any corpus size; the per-row products are ≤ ~10¹² for unit-scale
    * embeddings, so the DECIMAL fold never sees a lossy double). The
    * d²/2 exploded products per row collapse in the map-side hash
    * aggregate (≤ d(d+1)/2 keys); only d²-bounded partials shuffle.
    *
    * The per-row product q_i·q_j is long×long (codegen'd in the hot
    * d²/2-per-row loop); past |q| = [[MaxGramElement]] (element ≈ 3034
    * after 10⁶ quantization) it would WRAP silently under non-ANSI
    * Spark — so out-of-range elements raise in-plan instead of
    * corrupting the "exact" statistics. The check is d comparisons per
    * row against d²/2 products: noise. */
  def gram(df: DataFrame, vecCol: String): DataFrame =
    // null/empty guard: sequence(0, -1) DESCENDS in Spark ([0, -1]),
    // so an empty array would evaluate element_at(_, 0) and throw, and
    // a null array would emit corrupt i = -1 cells — drop such rows,
    // which is also what the oracle's generate_series(0, -1) does.
    // fanOutExpansion: the d(d+1)/2-fold product expansion below makes
    // one input byte ~d²/8 bytes of generated work, so an
    // underparallelized scan (input smaller than cores×splits) is
    // rebalanced first — a no-op at corpus scale (Rebalance doc).
    Rebalance.fanOutExpansion(
      df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        .select(col(vecCol)))
      .select(microVec(col(vecCol)).as("__q"))
      // explicit range check, not abs(): a double big enough to saturate
      // the non-ANSI cast to exactly Long.MinValue has abs(Long.MinValue)
      // = Long.MinValue (negative), which an abs() predicate passes —
      // the product would then wrap silently instead of raising
      .select(when(exists(col("__q"), q =>
          q > lit(MaxGramElement) || q < lit(-MaxGramElement)),
          raise_error(lit("Pca.gram: element magnitude exceeds " +
            "~3034 after 10^6 quantization - q*q would overflow long; " +
            "rescale the embedding column first")))
        .otherwise(col("__q")).as("__q"))
      // Two-level codegen'd explode: (i, q_i) from the vector, then the
      // tail slice q_i..q_{d-1} for the products — emits the identical
      // d(d+1)/2 (i, j, p) rows per vector as the nested
      // transform/flatten/named_struct build this replaced, but where
      // that build ran as CodegenFallback (higher-order functions are
      // interpreted, evaluated per element of a d²/2 array — the one
      // non-codegen expression on a corpus-scale hot path this engine
      // had), posexplode/slice/multiply all stay inside whole-stage
      // codegen straight into the partial hash aggregate. Same sums,
      // same grouping, bit-identical output (integer arithmetic is
      // order-free); measured ~3× on the 2k×64-dim fixture (with the
      // fan-out above).
      .select(col("__q"), posexplode(col("__q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"),
        posexplode(slice(col("__q"), col("i") + 1,
          size(col("__q")) - col("i"))).as(Seq("joff", "qj")))
      .select(col("i"), (col("i") + col("joff")).as("j"),
        (col("qi") * col("qj")).as("p"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast(DecimalType(38, 0))).as("sp"))

  /** Per-dimension first moments: (i, n, s) with s = Σ q_i exact.
    * Same null/empty guard as [[gram]] so the two statistics always
    * describe the identical row set. */
  def moments(df: DataFrame, vecCol: String): DataFrame =
    Rebalance.fanOutExpansion(
      df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        .select(col(vecCol)))
      .select(posexplode(microVec(col(vecCol))).as(Seq("i", "x")))
      .groupBy("i")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).as("s"))

  /** Fitted model: `components(k)(i)` is the i-th coordinate of the
    * k-th principal axis (rows orthonormal, eigenvalues descending,
    * sign fixed so each axis's largest-|coordinate| entry is positive —
    * a deterministic convention, since eigenvectors are sign-free). */
  final case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]],
                            totalVariance: Double)

  /** The exact integer sufficient statistics, collected: n, per-dim
    * sums S_i, and the full symmetric products matrix P_ij — ONE driver
    * round-trip of d² + d bounded rows (model-scale, like the centroid
    * collects; never corpus-scale). */
  final case class Stats(n: Long, s: Array[BigInt], p: Array[Array[BigInt]]) {
    def dim: Int = s.length
  }

  def collectStats(df: DataFrame, vecCol: String): Stats =
    statsFromRows(gram(df, vecCol).collect(),
      moments(df, vecCol).collect())

  /** Shared Row → [[Stats]] assembly for [[collectStats]] and
    * [[fitRefreshed]] (one parser, so the refit bit-identity law can
    * never drift on a schema change). Validates that every dimension
    * saw the SAME row count — ragged embedding lengths would otherwise
    * silently yield a covariance built from mismatched n/S/P. */
  private def statsFromRows(gRows: Array[org.apache.spark.sql.Row],
                            mRows: Array[org.apache.spark.sql.Row]): Stats = {
    require(gRows.nonEmpty && mRows.nonEmpty,
      "Pca.statsFromRows: empty corpus (no rows with a non-empty vector)")
    val dim = mRows.map(_.getInt(0)).max + 1
    val counts = mRows.map(_.getLong(1)).distinct
    require(counts.length == 1,
      s"Pca: ragged embedding dimensions — per-dim row counts ${counts.sorted.mkString(",")} differ; fix the corpus (every vector must have the same length)")
    val n = counts.head
    // Gram and moments come from two independent jobs (and, under the
    // streaming maintenance layout, two NON-ATOMIC per-batch writes:
    // gram_batches then moment_batches). A crash between them leaves a
    // micro-batch counted in one statistic but not the other, and a fit
    // from mismatched n/S/P is silently wrong. Every Gram cell carries
    // its own n, so consistency is a free cross-check here: all cells
    // must agree with the moments' shared n.
    val gramCounts = gRows.map(_.getLong(2)).distinct
    require(gramCounts.length == 1 && gramCounts.head == n,
      s"Pca: Gram/moment row counts disagree (gram n=${gramCounts.sorted.mkString(",")}, moments n=$n) — the two statistics describe different row sets (torn partial-batch write?); rebuild the stats state")
    val s = Array.ofDim[BigInt](dim)
    mRows.foreach(row => s(row.getInt(0)) = BigInt(row.getDecimal(2).toBigInteger))
    val p = Array.ofDim[BigInt](dim, dim)
    gRows.foreach { row =>
      val (i, j) = (row.getInt(0), row.getInt(1))
      val v = BigInt(row.getDecimal(3).toBigInteger)
      p(i)(j) = v; p(j)(i) = v
    }
    Stats(n, s, p)
  }

  /** Exact integer numerator of the covariance trace:
    * Σ_i (n·P_ii − S_i²) — the scalar that pins the distributed stats
    * in an external oracle (trace = this / (n·(n−1)·10¹²)). */
  def traceNumerator(stats: Stats): BigInt = {
    val nB = BigInt(stats.n)
    (0 until stats.dim)
      .map(i => nB * stats.p(i)(i) - stats.s(i) * stats.s(i)).sum
  }

  /** Fit PCA from the exact integer statistics: covariance
    * cov_ij = (n·P_ij − S_i·S_j) / (n·(n−1)) in micro² units, scaled
    * back by 10⁻¹². Driver work and driver data are d²-bounded. */
  def fit(df: DataFrame, vecCol: String, r: Int): PcaModel =
    fitFromStats(collectStats(df, vecCol), r)

  def fitFromStats(stats: Stats, r: Int): PcaModel = {
    val dim = stats.dim
    require(r >= 1 && r <= dim, s"Pca.fit: need 1 <= r <= $dim, got $r")
    val n = stats.n
    require(n >= 2, s"Pca.fit: need at least 2 rows, got $n")
    val s = stats.s
    val p = stats.p
    val nB = BigInt(n)
    val denom = (nB * (nB - 1)).toDouble * 1e12
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      (nB * p(i)(j) - s(i) * s(j)).toDouble / denom
    }
    val mean = Array.tabulate(dim)(i => s(i).toDouble / (n * 1e6))
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val order = eigVals.indices.sortBy(k => -eigVals(k))
    val topVals = order.take(r).map(eigVals).toArray
    val topVecs = order.take(r).map { k =>
      val v = Array.tabulate(dim)(i => eigVecs(i)(k))
      // deterministic sign: largest-|coordinate| entry positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    PcaModel(dim, n, mean, topVals, topVecs, eigVals.sum)
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: deterministic
    * sweep order, rotations until the off-diagonal Frobenius mass
    * falls below 1e-14 × trace-scale (≤ ~12 sweeps for d = 64 — d³
    * driver flops, corpus-independent). Returns (eigenvalues,
    * column-eigenvector matrix). Public-domain textbook algorithm
    * (Golub & Van Loan §8.5). */
  private[operators] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scale = math.max(1e-300, a.indices.map(i => math.abs(a(i)(i))).max)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-14 * scale && sweep < 50) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sN = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sN * akq
              a(k)(q) = sN * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sN * aqk
              a(q)(k) = sN * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sN * vkq
              v(k)(q) = sN * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Incremental-maintenance form of the sufficient statistics — the
    * [[Maintain]] pattern applied to model fitting: the Gram and moment
    * sums are EXACT INTEGER partials (associative, commutative), so a
    * persisted state refreshes from a delta alone and the refit model
    * is IDENTICAL to a from-scratch fit over base ∪ delta — retraining
    * PCA after a daily append costs |state| (d²-bounded) + |delta|,
    * never a corpus rescan. */
  def writeStatsState(df: DataFrame, vecCol: String, dir: String): Unit = {
    gram(df, vecCol).write.mode("overwrite").parquet(s"$dir/gram")
    moments(df, vecCol).write.mode("overwrite").parquet(s"$dir/moments")
    Dedup.writeMeta(df.sparkSession, dir, Map("kind" -> "pca_stats"))
  }

  private def requireStatsState(spark: SparkSession, dir: String): Unit = {
    val meta = Dedup.readMeta(spark, dir)
    require(meta.get("kind").contains("pca_stats"),
      s"$dir is not PCA stats state (kind=${meta.get("kind")})")
  }

  /** Refreshed Gram partials: stored (i, j, n, sp) ∪ the delta's,
    * folded per cell — integer addition, fold-order-free, chains. */
  def mergeGramState(spark: SparkSession, dir: String, delta: DataFrame,
                     vecCol: String): DataFrame = {
    requireStatsState(spark, dir)
    Dedup.readPq(spark, s"$dir/gram")
      .unionByName(gram(delta, vecCol))
      .groupBy("i", "j")
      .agg(sum(col("n")).as("n"),
        sum(col("sp")).cast(DecimalType(38, 0)).as("sp"))
  }

  /** Refreshed first-moment partials, mirroring [[mergeGramState]]. */
  def mergeMomentState(spark: SparkSession, dir: String, delta: DataFrame,
                       vecCol: String): DataFrame = {
    requireStatsState(spark, dir)
    Dedup.readPq(spark, s"$dir/moments")
      .unionByName(moments(delta, vecCol))
      .groupBy("i")
      .agg(sum(col("n")).as("n"),
        sum(col("s")).cast(DecimalType(38, 0)).as("s"))
  }

  /** One delta's Gram partials — the per-micro-batch body of
    * `StreamOps.maintainPcaStream` (meta-checked so a wrong-kind dir
    * refuses loudly before any write). */
  private[graft] def gramDeltaPartials(spark: SparkSession, dir: String,
                                       delta: DataFrame,
                                       vecCol: String): DataFrame = {
    requireStatsState(spark, dir)
    gram(delta, vecCol)
  }

  private[graft] def momentDeltaPartials(spark: SparkSession, dir: String,
                                         delta: DataFrame,
                                         vecCol: String): DataFrame = {
    requireStatsState(spark, dir)
    moments(delta, vecCol)
  }

  /** Streaming-refresh read side, mirroring
    * [[Maintain.readAggRefreshed]]: base Gram state ∪ every committed
    * micro-batch's partials (written by `StreamOps.maintainPcaStream`
    * into `ingest_batch=<id>` overwrite partitions — replay rewrites
    * identical partials, never double-folds), folded per (i, j). */
  def readGramRefreshed(spark: SparkSession, dir: String): DataFrame = {
    requireStatsState(spark, dir)
    foldWithBatches(spark, s"$dir/gram", s"$dir/gram_batches",
      Seq("i", "j"), "n" -> "sp")
  }

  /** First-moment twin of [[readGramRefreshed]] (the stream writes
    * BOTH partial kinds — a Gram-only fold could not rebuild the mean,
    * and the refit would silently mix full-corpus P with base-only S). */
  def readMomentsRefreshed(spark: SparkSession, dir: String): DataFrame = {
    requireStatsState(spark, dir)
    foldWithBatches(spark, s"$dir/moments", s"$dir/moment_batches",
      Seq("i"), "n" -> "s")
  }

  private def foldWithBatches(spark: SparkSession, basePath: String,
                              batchesPath: String, keys: Seq[String],
                              agg: (String, String)): DataFrame = {
    val base = Dedup.readPq(spark, basePath)
    val bp = new org.apache.hadoop.fs.Path(batchesPath)
    val fs = bp.getFileSystem(spark.sessionState.newHadoopConf())
    val all =
      if (fs.exists(bp))
        base.unionByName(Dedup.readPq(spark, batchesPath).drop("ingest_batch"))
      else base
    val (nCol, sCol) = agg
    all.groupBy(keys.map(col): _*)
      .agg(sum(col(nCol)).as(nCol),
        sum(col(sCol)).cast(DecimalType(38, 0)).as(sCol))
  }

  /** Refit from the STREAMED state: both refreshed statistics collected
    * and solved — equals a from-scratch [[fit]] over base ∪ every
    * committed micro-batch, bit for bit. */
  def fitStreamRefreshed(spark: SparkSession, dir: String,
                         r: Int): PcaModel =
    fitFromStats(statsFromRows(
      readGramRefreshed(spark, dir).collect(),
      readMomentsRefreshed(spark, dir).collect()), r)

  /** Refit from refreshed state: collects the d²-bounded merged
    * partials and solves — the model equals a from-scratch
    * [[fit]] over base ∪ delta exactly (the statistics do). */
  def fitRefreshed(spark: SparkSession, dir: String, delta: DataFrame,
                   vecCol: String, r: Int): PcaModel =
    fitFromStats(statsFromRows(
      mergeGramState(spark, dir, delta, vecCol).collect(),
      mergeMomentState(spark, dir, delta, vecCol).collect()), r)

  /** Scan-only projection: out_k = Σ_i V_k,i · (x_i − μ_i). The model
    * enters the plan as LITERAL arrays (broadcast-free — it rides the
    * serialized plan), centering is one `zip_with`, each component one
    * codegen'd fold; no shuffle, no UDF. */
  def project(df: DataFrame, model: PcaModel, vecCol: String,
              outCol: String = "pca"): DataFrame = {
    val muLit = array(model.mean.map(lit): _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), muLit,
      (x, mu) => x - mu)
    val comps = model.components.map { w =>
      val wLit = array(w.map(lit): _*)
      aggregate(zip_with(centered, wLit, (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
