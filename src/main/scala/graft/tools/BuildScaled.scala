package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes an N×-scaled, content-disjoint derivation of a driver sf dir
  * (the [[ScaleProbe.buildScaled]] construction: fact keys shifted per
  * copy, documents Caesar-rotated and embeddings cyclically rotated
  * into disjoint content namespaces, dims shared) to a target dir —
  * the input for the scale-decade correctness sweep: the full gate
  * battery plus its DuckDB oracles replayed over ~10× the bench scale
  * (sf0.1 × 10 ≈ sf1: ~6M lineitem), pushing the oracle evidence one
  * decade closer to the 100× design claim without touching the
  * read-only driver testdata.
  *
  * Usage: runMain graft.tools.BuildScaled <baseDir> <outDir> <copies>
  */
object BuildScaled {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: BuildScaled <baseDir> <outDir> <copies>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.buildScaled(spark, args(0), args(1), args(2).toInt)
    println(s"[buildscaled] wrote ${args(2)}x of ${args(0)} to ${args(1)}")
    spark.stop()
  }
}
