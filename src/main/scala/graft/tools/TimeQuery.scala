package graft.tools

import org.apache.spark.sql.SparkSession

/** Local plan-iteration timer: runs a named query (bench-form if an
  * override exists) `reps` times in one JVM and prints per-rep seconds,
  * separating one-time plan/codegen compile cost from steady-state data
  * cost — the split the single-shot Bench loop can't show.
  *
  * Usage: runMain graft.tools.TimeQuery <name> [reps] [sfDir]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.benchOverrides.getOrElse(name,
      graft.SparkEntry.queries(name))
    (1 to reps).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timequery] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
