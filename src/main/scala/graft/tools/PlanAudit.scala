package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession
/** Per-round physical-plan audit: shuffle/broadcast/join-strategy
  * counts per registered query; red flags are unexpected CartesianProduct
  * or shuffle exchanges on dimension joins. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val ex = "Exchange".r.findAllIn(plan).length
        val bc = "BroadcastExchange".r.findAllIn(plan).length
        val cart = "CartesianProduct".r.findAllIn(plan).length
        val bnl = "BroadcastNestedLoop".r.findAllIn(plan).length
        val smj = "SortMergeJoin".r.findAllIn(plan).length
        println(f"[audit] $name%-24s shufEx=${ex - bc}%2d bcast=$bc%2d smj=$smj cart=$cart bnlj=$bnl")
      } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
