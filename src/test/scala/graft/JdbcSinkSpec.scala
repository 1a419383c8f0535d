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

  test("JDBC overwrite is idempotent (the drop+create+insert cycle)") {
    val df = SparkEntry.queries("ref_products_passthrough")(
      spark, "/root/testdata/sf0.001").limit(50)
    Sinks.overwriteJdbc(df, url, "products")
    Sinks.overwriteJdbc(df, url, "products") // second run must not fail
    val back = spark.read.jdbc(url, "products", new java.util.Properties)
    assert(back.count() == 50)
  }
}
