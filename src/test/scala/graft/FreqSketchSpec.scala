package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{FreqSketch, TextOps}

/** Misra–Gries laws: bounded buffers, never-overcount, the N/(k+1)
  * undercount bound, guaranteed presence above the support threshold —
  * exercised both on the raw Aggregator (adversarial planted streams,
  * arbitrary merge splits) and through the Spark partial-aggregation
  * path with k forced BELOW the vocabulary so evictions really happen. */
class FreqSketchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // planted Zipf-ish stream: term i appears ~ N/i times, shuffled
  // deterministically so partial buffers see interleaved items
  private val planted: Vector[String] = {
    val raw = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val r = new scala.util.Random(42)
    r.shuffle(raw.toVector)
  }
  private val exact: Map[String, Long] =
    planted.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  private def runSequential(k: Int, xs: Seq[String]): Map[String, Long] = {
    val a = new FreqSketch.MisraGriesAgg(k)
    xs.foldLeft(a.zero)(a.reduce)
  }

  test("buffer never exceeds k entries through reduce or merge") {
    val a = new FreqSketch.MisraGriesAgg(5)
    val trace = planted.scanLeft(a.zero)(a.reduce)
    assert(trace.forall(_.size <= 5))
    val m = a.merge(runSequential(5, planted.take(5000)),
      runSequential(5, planted.drop(5000)))
    assert(m.size <= 5)
  }

  test("estimates never overcount and undercount by at most N/(k+1)") {
    val k = 16
    val n = planted.size.toLong
    for ((chunks, label) <- Seq(
        Seq(planted) -> "single",
        planted.grouped(997).toSeq -> "997-chunks",
        planted.grouped(13).toSeq -> "13-chunks")) {
      val a = new FreqSketch.MisraGriesAgg(k)
      val sk = chunks.map(c => runSequential(k, c)).reduce(a.merge)
      sk.foreach { case (t, est) =>
        assert(est <= exact(t), s"$label: $t overcounted")
        assert(exact(t) - est <= n / (k + 1), s"$label: $t undercounted past bound")
      }
      // presence theorem: every item above N/(k+1) must be in the sketch
      exact.foreach { case (t, c) =>
        if (c > n / (k + 1))
          assert(sk.contains(t), s"$label: heavy item $t missing")
      }
    }
  }

  test("Spark path with k below the vocabulary still obeys both theorems") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val ex = docs.groupBy("term").count().as[(String, Long)].collect().toMap
    val n = ex.values.sum
    val k = 8 // vocabulary is ~31: forces evictions in every buffer
    val sk = FreqSketch.heavyHitters(docs, "term", k)
      .as[(String, Long)].collect().toMap
    assert(sk.size <= k)
    sk.foreach { case (t, est) =>
      assert(est <= ex(t) && ex(t) - est <= n / (k + 1))
    }
    ex.foreach { case (t, c) =>
      if (c > n / (k + 1)) assert(sk.contains(t))
    }
  }

  test("CMS: JVM bucket == SQL bucket for every (row, item)") {
    val items = exact.keys.toSeq.sorted
    val w = 37 // non-power-of-two to catch modulus mistakes
    for (r <- 0 until 4) {
      val sql = items.toDF("item")
        .select(FreqSketch.CountMin.bucketCol(r, col("item"), w).as("b"))
        .as[Long].collect()
      val jvm = items.map(FreqSketch.CountMin.bucket(r, _, w).toLong)
      assert(sql.toSeq == jvm, s"row $r bucket mismatch")
    }
  }

  test("CMS never undercounts; exact when no bucket collides") {
    val a = new FreqSketch.CountMinAgg(4, 512)
    val sk = planted.foldLeft(a.zero)(a.reduce)
    def est(t: String): Long =
      (0 until 4).map(r =>
        sk(r * 512 + FreqSketch.CountMin.bucket(r, t, 512))).min
    exact.foreach { case (t, c) => assert(est(t) >= c, s"$t undercounted") }
    // 40 items in 512 buckets: at least one of 4 rows is collision-free
    // for this fixed family — verified by exactness of every estimate
    val errs = exact.map { case (t, c) => est(t) - c }
    assert(errs.sum >= 0 && errs.max <= planted.size / 128,
      s"CMS error bound blown: ${errs.max}")
  }

  test("CMS merge-split invariance: any partitioning sums to one sketch") {
    val a = new FreqSketch.CountMinAgg(3, 64)
    val whole = planted.foldLeft(a.zero)(a.reduce)
    for (chunkSize <- Seq(13, 997)) {
      val merged = planted.grouped(chunkSize)
        .map(c => c.foldLeft(a.zero)(a.reduce)).reduce(a.merge)
      assert(merged.toSeq == whole.toSeq, s"chunk $chunkSize diverged")
    }
  }

  test("CMS Spark path: partial aggregation, estimates match JVM sketch") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val terms = docs.as[String].collect()
    val a = new FreqSketch.CountMinAgg(4, 512)
    val jvmSk = terms.foldLeft(a.zero)(a.reduce)
    val sparkDf = FreqSketch.countMinSketch(docs, "term", 4, 512)
    assert(sparkDf.as[Array[Long]].collect().head.toSeq == jvmSk.toSeq)
    val plan = sparkDf.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregate pair in:\n$plan")
    // estimate lookup (codegen'd chain) == direct JVM min-of-cells
    val ex = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = docs.distinct()
      .crossJoin(sparkDf)
      .select(col("term"),
        FreqSketch.countMinEstimate(col("sk"), col("term"), 4, 512).as("e"))
      .as[(String, Long)].collect().toMap
    ex.keys.foreach { t =>
      val direct = (0 until 4).map(r =>
        jvmSk(r * 512 + FreqSketch.CountMin.bucket(r, t, 512))).min
      assert(got(t) == direct, s"$t: SQL estimate ${got(t)} != JVM $direct")
      assert(got(t) >= ex(t), s"$t undercounted")
    }
  }

  test("sketch aggregates partially: bounded buffers cross the shuffle") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val plan = FreqSketch.heavyHitters(docs, "term", 64)
      .queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate|SortAggregate".r
      .findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final aggregate pair in:\n$plan")
  }
}
