package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Group-wise feature normalization — the standardization step in
  * front of modeling / outlier fences, shaped for the 100 TB fact
  * table: per-group statistics reduce through ONE partial-aggregating
  * groupBy (G result rows), broadcast back, and the z-scores are a
  * scan-side projection. The naive `(x - avg) over (partition by g)`
  * window form shuffles the ENTIRE fact table into per-group
  * partitions — the hot-key trap the two-phase window family exists to
  * avoid; here the window is unnecessary outright.
  *
  * Exactness contract (the [[Maintain]] DECIMAL lesson applied to
  * standardization): values quantize to integers at a caller-chosen
  * scale (floor(x·scale + 0.5) — the [[graft.functions.QuantExprs]]
  * rounding), moments S = Σq and Q = Σq² accumulate as exact DECIMAL
  * integers (fold-order-free), and the score is
  *
  *   z = (n·q − S) / sqrt(n·Q − S²)
  *
  * — numerator an exact integer, denominator ONE sqrt of an exact
  * integer — so both engines compute the identical double and the gate
  * hash-matches at round-6 with no tolerance. (Algebra: with
  * population σ² = Q/n − (S/n)², (q − S/n)/σ = (n·q − S)/√(n·Q − S²).) */
object Normalize {

  private def quant(c: Column, scale: Long): Column =
    floor(c.cast("double") * lit(scale.toDouble) + lit(0.5)).cast("long")

  /** Append a z-score column for `valCol` standardized within
    * `keyCol` groups. `scale` sets the value quantum (100 for cent
    * precision, 10⁶ for micro units). Groups with zero variance (or a
    * single row) yield null z — loud in data, not NaN/Infinity. Rows
    * whose group key is NULL also survive with null z (left join):
    * the operator APPENDS a column, it never drops rows.
    *
    * The stats side carries one row per group. G is caller data, not
    * a structural bound — per-user or per-document standardization
    * makes G corpus-proportional — so the join carries NO forced
    * broadcast hint: AQE measures the aggregated stats at runtime and
    * converts to broadcast when it actually fits (the rare-gram
    * precedent in [[graft.operators.Dedup.ngramJaccardPairs]]). */
  def groupZScore(df: DataFrame, keyCol: String, valCol: String,
                  scale: Long = 1000000L,
                  outCol: String = "z"): DataFrame = {
    require(scale >= 1, s"groupZScore: scale must be >= 1, got $scale")
    val q = quant(col(valCol), scale)
    val stats = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"),
        sum(q.cast(DecimalType(38, 0))).as("__s"),
        // square in DECIMAL: q² as long×long overflows past |q| ~ 3e9
        // (scale 10⁶ × values ≥ ~3000)
        sum(q.cast(DecimalType(19, 0)) * q.cast(DecimalType(19, 0)))
          .as("__q2"))
      // variance numerator n·Q − S² as an exact DECIMAL, then ONE
      // deterministic cast to double for the sqrt
      .withColumn("__d",
        sqrt((col("__n") * col("__q2") - col("__s") * col("__s"))
          .cast("double")))
      .select(col(keyCol), col("__n"), col("__s"), col("__d"))
    df.join(stats, Seq(keyCol), "left")
      .withColumn(outCol,
        // numerator in DECIMAL: a long×long n·q would overflow
        // silently at warehouse row counts
        when(col("__d") > 0.0,
          round((col("__n") * q.cast(DecimalType(38, 0)) - col("__s"))
            .cast("double") / col("__d"), 6)))
      .drop("__n", "__s", "__d")
  }
}
