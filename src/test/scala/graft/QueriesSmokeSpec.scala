package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run end-to-end on sf0.001, and every
  * oracle key must reference a registered query. (Value-level
  * correctness is the driver's DuckDB gate — see tools/oracle_check.py.) */
class QueriesSmokeSpec extends AnyFunSuite with SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // forces full execution; throws on any plan error
    }
  }
}
