package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** K2 JDBC parity: the reference's actual sink is a database bulk load
  * (multi-row INSERT over libpq — `/root/reference/dags/etl.py:237-288`,
  * `dags/utils/df_to_sql.py:12-13`). No Postgres ships in this
  * environment, so the round trip runs against embedded Derby (on
  * Spark's classpath for the Hive metastore): same `DataFrameWriter
  * .jdbc` overwrite path, real driver, real SQL types. */
class JdbcSinkSpec extends AnyFunSuite with SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JDBC overwrite round trip preserves users-enriched exactly") {
    val df = SparkEntry.queries("ref_users_enriched")(
      spark, "/root/testdata/sf0.001")
    Sinks.overwriteJdbc(df, url, "users_enriched")
    val back = spark.read.jdbc(url, "users_enriched",
      new java.util.Properties)
    assert(back.count() == df.count() && back.count() > 0)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("partitioned JDBC read: real range slices, content parity, empty fallback") {
    val df = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    Sinks.overwriteJdbc(df, url, "orders_part")
    val back = Sinks.readJdbcPartitioned(spark, url, "orders_part",
      "o_orderkey", numPartitions = 4)
    // the read plan must actually carry 4 range slices — one connection
    // per slice is the point of the partitioned form
    assert(back.rdd.getNumPartitions == 4,
      s"expected 4 JDBC range partitions, got ${back.rdd.getNumPartitions}")
    assert(back.count() == df.count() && back.count() > 0)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "partitioned read lost or duplicated rows across slice boundaries")
    // empty table: no bounds to split — falls back to the plain read
    Sinks.overwriteJdbc(df.limit(0), url, "orders_empty")
    assert(Sinks.readJdbcPartitioned(spark, url, "orders_empty",
      "o_orderkey").count() == 0)
  }

  test("filters and projections push through the partitioned JDBC read") {
    val df = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    Sinks.overwriteJdbc(df, url, "orders_push")
    val q = Sinks.readJdbcPartitioned(spark, url, "orders_push",
      "o_orderkey", numPartitions = 4)
      .filter(org.apache.spark.sql.functions.col("o_orderkey") <= 100)
      .select("o_orderkey", "o_orderstatus")
    // the predicate must reach the DATABASE (per-slice WHERE), not run
    // as a Spark filter over a full-table stream — at a real warehouse
    // that is the difference between an index range scan and shipping
    // the table
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"),
      s"o_orderkey <= 100 was not pushed into the JDBC scan:\n$plan")
    assert(q.count() == df.filter("o_orderkey <= 100").count())
  }

  test("JDBC overwrite is idempotent (the drop+create+insert cycle)") {
    val df = SparkEntry.queries("ref_products_passthrough")(
      spark, "/root/testdata/sf0.001").limit(50)
    Sinks.overwriteJdbc(df, url, "products")
    Sinks.overwriteJdbc(df, url, "products") // second run must not fail
    val back = spark.read.jdbc(url, "products", new java.util.Properties)
    assert(back.count() == 50)
  }
}
