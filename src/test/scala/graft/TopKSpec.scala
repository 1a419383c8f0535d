package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TopK
import graft.sources.Tables

class TopKSpec extends AnyFunSuite with SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("aggregator top-k == window row_number top-k") {
    val src = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("g"), col("o_orderkey"),
        col("o_totalprice"))
    val got = TopK.topKPerGroup(src, "g", "o_orderkey", "o_totalprice", 10)
    val w = Window.partitionBy("g")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = src.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 10)
      .select(col("g"), col("o_orderkey"), col("o_totalprice"), col("rk"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("top-k aggregates partially (bounded rows cross the shuffle)") {
    val src = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("g"), col("o_orderkey"),
        col("o_totalprice"))
    val plan = TopK.topKPerGroup(src, "g", "o_orderkey", "o_totalprice", 5)
      .queryExecution.executedPlan.toString
    // typed-aggregator plans run as ObjectHashAggregate with a partial
    // (map-side) phase before the exchange
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial"))
  }

  test("similarity top-k reduces via the partial aggregator, not a window") {
    val e = Tables.embeddings(spark, dir)
    val plan = graft.operators.Similarity
      .bruteForceTopK(e, e.filter(col("vec_id") < 2), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial"))
    // the row_number reduction this replaced would show a Window node
    assert(!plan.contains("Window"))
  }

  test("IVF assignment is narrow: no window, one bounded shuffle total") {
    val e = Tables.embeddings(spark, dir)
    val df = graft.operators.Similarity.ivfTopK(e, e.filter(col("vec_id") < 2), 5)
    val plan = df.queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val self = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case other => Seq(other)
      }
      self ++ p.children.flatMap(nodes)
    }
    // corpus assignment is a literal-model projection straight off the
    // scan and probe selection an array_sort/slice explode — the ONLY
    // exchange in the whole IVF plan is the bounded final top-k (the
    // row_number formulation this replaced shuffled nCentroids× the
    // corpus, embeddings included, just to keep one row per vector)
    assert(!plan.toString.contains("Window"),
      "IVF must not reduce assignments via a row_number window")
    val shuffles = nodes(plan).count(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles <= 1, s"IVF plans $shuffles shuffles, budget is 1")
    assert(plan.toString.contains("ObjectHashAggregate") &&
      plan.toString.contains("partial"))
  }

  test("reduce respects the floor and merge is a bounded sorted merge") {
    val a = new TopK.TopKAgg(3)
    val items = Seq(5.0, 1.0, 9.0, 7.0, 9.0, 3.0).zipWithIndex
      .map { case (s, i) => TopK.Scored(s, i.toLong) }
    val buf = items.foldLeft(a.zero)(a.reduce)
    // top 3 by (score desc, id asc): (9.0,2), (9.0,4), (7.0,3)
    assert(buf.map(x => (x.score, x.id)) == Seq((9.0, 2L), (9.0, 4L), (7.0, 3L)))
    val other = Seq(TopK.Scored(8.0, 10L), TopK.Scored(2.0, 11L))
      .foldLeft(a.zero)(a.reduce)
    val merged = a.merge(buf, other)
    assert(merged.map(x => (x.score, x.id)) == Seq((9.0, 2L), (9.0, 4L), (8.0, 10L)))
  }
}
