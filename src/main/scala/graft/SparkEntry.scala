package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Composite, Extensions, Relational, Relational2, Relational3}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a named query here; where the
  * semantics are ANSI-SQL-expressible it also registers DuckDB oracle SQL
  * (hash-compared by the driver at sf0.01).
  */
object SparkEntry {

  /** Flagship: the reference's semantic core (fact ⋈ dim ⋈ dim + project
    * — SURVEY §3.3) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs("ref_orders_enriched")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++
      Composite.defs ++ Extensions.defs

  /** DuckDB-runnable oracle per query; omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++
      Composite.oracles ++ Extensions.oracles

  /** Bench-only plan substitutions — queries whose REGISTERED form
    * carries oracle apparatus (exact verdict legs for tolerance gates)
    * that the correctness gate needs but a perf row shouldn't bill.
    * Correctness (`Verify`) always runs `queries`; `Bench` applies
    * these overrides so the sf0.1 numbers time the deployment plan. */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] =
    Relational3.benchDefs ++ Extensions.benchDefs

  /** Bench-only exclusions: `q_profile` is the exact-multi-distinct
    * oracle twin kept for DuckDB comparability (its 100 TB form is
    * `q_profile_approx`); timing it at sf0.1 measures the Expand the
    * approx profiler exists to avoid (VERDICT r11 §perf). */
  def benchExclude: Set[String] = Set("q_profile")
}
