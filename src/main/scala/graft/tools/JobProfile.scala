package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job time profile for one registered query (bench form if an
  * override exists): runs it `reps` times and prints every Spark job's
  * wall-clock with its call site — the local stand-in for the Spark UI's
  * job table (guide §1.1/§7.1), which a headless bench box doesn't have.
  * The per-job split is what separates "one hot shuffle" from "fifty
  * sequential small actions", which TimeQuery's single number can't.
  *
  * Usage: runMain graft.tools.JobProfile <name> [reps] [sfDir]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var rows = List.empty[(Int, Double, String)]
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties).flatMap { p =>
          Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))
        }.getOrElse(j.stageInfos.headOption.map(_.name.take(80)).getOrElse("?"))
        starts.put(j.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          rows = (j.jobId, (System.nanoTime() - t0) / 1e9, site) :: rows
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    val q = graft.SparkEntry.benchOverrides.getOrElse(name,
      graft.SparkEntry.queries(name))
    (1 to reps).foreach { i =>
      rows = Nil
      System.gc()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the listener bus so late job-end events land before we print
      org.apache.spark.sql.graftbridge.ColumnBridge.drainListenerBus(spark)
      val done = rows.sortBy(_._1)
      println(f"[jobprofile] $name rep $i: wall=$wall%.3f s, " +
        f"jobs=${done.size}, job-sum=${done.map(_._2).sum}%.3f s")
      done.foreach { case (id, sec, site) =>
        println(f"[jobprofile]   job $id%4d  $sec%7.3f s  $site")
      }
    }
    spark.stop()
  }
}
