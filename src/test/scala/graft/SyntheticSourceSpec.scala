package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SyntheticSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def synth(rows: Int, parts: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly N distinct deterministic rows") {
    val df = synth(500, 4)
    assert(df.count() == 500)
    assert(df.select("id").distinct().count() == 500)
    val row = df.filter(col("id") === 7L).collect().head
    assert(row.getString(1) == "user_7")
    assert(row.getString(2) == "F") // 7 % 3 == 1
    assert(row.getString(3) == "2023-12-25") // 2024-01-01 minus 7 days
  }

  test("output is independent of the partition count") {
    val a = synth(300, 1).collect().map(_.toString).sorted.toSeq
    val b = synth(300, 7).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("row range is split across the requested partitions") {
    assert(synth(1000, 8).rdd.getNumPartitions == 8)
  }

  test("id-range filters are pushed into generation") {
    // a billion-row table filtered to [100, 200): without pushdown this
    // would generate 10^9 rows; with it, only the 100-row slice exists
    val df = spark.read.format("graft-synth")
      .option("rows", 1000000000L).option("partitions", 4).load()
      .filter(col("id") >= 100L && col("id") < 200L)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.head.scan.description().contains("[100, 200)"))
    assert(df.count() == 100)
    assert(df.agg(min("id"), max("id")).as[(Long, Long)].head() == ((100L, 199L)))
  }

  test("contradictory pushed range yields zero rows, not a crash") {
    val df = synth(1000, 4).filter(col("id") > 500L && col("id") < 100L)
    assert(df.count() == 0)
  }

  test("column pruning reaches the reader") {
    val plan = synth(100, 2).select("id").queryExecution.executedPlan
    val scans = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    // the pruned read schema is just `id` — names/dates are never built
    assert(scans.head.output.map(_.name) == Seq("id"))
  }
}
