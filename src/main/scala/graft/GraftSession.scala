package graft

import org.apache.spark.sql.SparkSession

/** Recommended session factory for library users: UTC, AQE, sized
  * shuffle partitions, graft SQL functions registered. */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new functions.GraftExtensions)

  def getOrCreate(master: String = "local[*]",
                  shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    // extensions only apply when the session is newly created; the
    // runtime registry + experimental-optimizer paths cover reuse
    functions.GraftFunctions.register(s)
    if (!s.experimental.extraOptimizations.contains(plans.RewriteJaccardIntersect))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ plans.RewriteJaccardIntersect
    s
  }
}
