package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The growth probe's replication must preserve what makes its ratios
  * meaningful: N× fact rows, unchanged dims, foreign keys still inside
  * the dim ranges, and the scaled dir readable through the same Tables
  * accessors the queries use. */
class ScaleProbeSpec extends AnyFunSuite with SparkSpec {

  test("buildScaled: 2x facts, unchanged dims, FKs stay joinable") {
    val base = "/root/testdata/sf0.001"
    val out = graft.sources.Scratch.dir("scale-spec")
    graft.tools.ScaleProbe.buildScaled(spark, base, out, 2)
    def n(d: String, t: String): Long = spark.read.parquet(s"$d/$t.parquet").count()
    assert(n(out, "orders") == 2 * n(base, "orders"))
    assert(n(out, "lineitem") == 2 * n(base, "lineitem"))
    assert(n(out, "customer") == n(base, "customer"))
    // primary keys stay distinct across copies...
    val o = spark.read.parquet(s"$out/orders.parquet")
    assert(o.select("o_orderkey").distinct().count() == o.count())
    // ...while every foreign key still matches the unscaled dimension
    val c = spark.read.parquet(s"$out/customer.parquet")
      .select(col("c_custkey"))
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .count() == 0, "scaled orders reference custkeys outside the dims")
    // events round-trip through the raw-nanos reader used by the battery
    assert(graft.sources.Tables.events(spark, out).count() ==
      2 * graft.sources.Tables.events(spark, base).count())
    // and a probed query runs on the scaled dir
    assert(SparkEntry.queries("q3_shipping_priority")(spark, out).count() == 10)
  }
}
