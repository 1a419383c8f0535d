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
