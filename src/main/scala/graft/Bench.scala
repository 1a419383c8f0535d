package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query and total
  * wall-clock seconds.
  *
  * Results are forced through the `noop` sink — a plain `count()` would
  * let Catalyst prune projections and under-measure the real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up passes so JIT/codegen/scan caches don't bill the first
    // queries: q1_agg covers the relational scan path, dedup_minhash the
    // custom-expression + documents path, sim_topk the vector path,
    // stream_tumbling_window the streaming micro-batch machinery
    Seq("q1_agg", "dedup_minhash", "sim_topk", "stream_tumbling_window")
      .foreach(n =>
      SparkEntry.queries.get(n).foreach { f =>
        try f(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // GC barrier: broadcast/checkpoint cleanup from the previous query
      // runs now instead of being billed to this query's wall-clock
      System.gc()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
