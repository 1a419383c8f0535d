package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
// Scratch: fast exchange-count printout for the PlanAuditSpec budget list.
object BudgetCheck {
  def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes) ++ p.subqueries.flatMap(collectNodes)
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = args(0).split(",").toSeq
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        val cnt = collectNodes(df.queryExecution.executedPlan)
          .count(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
        println(s"[budget] $n $cnt")
      } catch { case e: Throwable => println(s"[budget] $n ERR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
