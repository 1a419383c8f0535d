package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Normalize

/** Group z-score laws: standardization identities per group, exact
  * agreement with a naive driver recompute, and the degenerate-group
  * null contract. */
class NormalizeSpec extends AnyFunSuite with SparkSpec {

  test("per-group mean ~0, population variance ~1") {
    val l = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val z = Normalize.groupZScore(
      l.select("l_orderkey", "l_linenumber", "l_returnflag",
        "l_extendedprice"),
      "l_returnflag", "l_extendedprice", scale = 100L)
    val stats = z.groupBy("l_returnflag")
      .agg(avg(col("z")).as("m"),
        avg(col("z") * col("z")).as("v"), count(lit(1)).as("n"))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-4,
        s"group ${r.getString(0)}: mean ${r.getDouble(1)} not ~0")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3,
        s"group ${r.getString(0)}: E[z²] ${r.getDouble(2)} not ~1")
    }
  }

  test("matches the naive driver recompute exactly (round-6)") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.00), ("a", 2L, 20.00), ("a", 3L, 40.00),
      ("b", 4L, 5.50), ("b", 5L, 7.50)).toDF("g", "id", "x")
    val got = Normalize.groupZScore(df, "g", "x", scale = 100L)
      .select("id", "z").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def naive(vals: Seq[(Long, Long)]): Map[Long, Double] = {
      val n = vals.size.toLong
      val s = vals.map(_._2).sum
      val q2 = vals.map(v => v._2 * v._2).sum
      val d = math.sqrt((n * q2 - s * s).toDouble)
      vals.map { case (id, q) =>
        id -> BigDecimal((n * q - s).toDouble / d)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    val want = naive(Seq((1L, 1000L), (2L, 2000L), (3L, 4000L))) ++
      naive(Seq((4L, 550L), (5L, 750L)))
    assert(got == want)
  }

  test("degenerate groups (singleton / zero variance) yield null z") {
    import spark.implicits._
    val df = Seq(("solo", 1L, 9.99), ("flat", 2L, 3.0), ("flat", 3L, 3.0))
      .toDF("g", "id", "x")
    val z = Normalize.groupZScore(df, "g", "x").select("id", "z").collect()
    z.foreach(r => assert(r.isNullAt(1),
      s"degenerate group row ${r.getLong(0)} got non-null z"))
  }

  test("null-keyed rows survive with null z (append, never drop)") {
    import spark.implicits._
    val df = Seq((Option("a"), 1L, 1.0), (Option("a"), 2L, 3.0),
      (Option.empty[String], 3L, 5.0)).toDF("g", "id", "x")
    val z = Normalize.groupZScore(df, "g", "x").collect()
    assert(z.length == 3, "groupZScore dropped rows")
    val nullRow = z.find(_.getLong(z.head.fieldIndex("id")) == 3L).get
    assert(nullRow.isNullAt(nullRow.fieldIndex("z")),
      "null-keyed row should carry null z")
  }

  test("high-G safety: no forced broadcast hint in the plan") {
    // per-user/per-document keys make G corpus-proportional; a forced
    // broadcast of the stats side would OOM the driver there. The join
    // must carry NO hint — AQE converts at runtime when stats fit.
    val l = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val z = Normalize.groupZScore(
      l.select("l_orderkey", "l_returnflag", "l_extendedprice"),
      "l_returnflag", "l_extendedprice", scale = 100L)
    val hints = z.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, "groupZScore forces a broadcast hint")
  }
}
