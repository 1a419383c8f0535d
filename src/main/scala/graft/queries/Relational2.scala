package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Second relational battery: reshaping (pivot/unpivot), statistical
  * aggregates, exact percentiles, regexp extraction, distinct
  * projection, scalar subqueries. Same output-type and determinism
  * conventions as [[Relational]]. */
object Relational2 {

  type Q = (SparkSession, String) => DataFrame

  private def sumDec(c: org.apache.spark.sql.Column, scale: Int) =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val defs: Map[String, Q] = Map(
    "q_pivot" -> ((s, d) =>
      // status × priority contingency counts. Explicit pivot values —
      // at scale an implicit pivot triggers a distinct-values job first.
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("status"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("1-URGENT", "p1")
        .withColumnRenamed("2-HIGH", "p2")
        .withColumnRenamed("3-MEDIUM", "p3")
        .withColumnRenamed("4-NOT SPECIFIED", "p4")
        .withColumnRenamed("5-LOW", "p5")),
    "q_unpivot" -> ((s, d) =>
      // wide → long over part's numeric attributes
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "value")),
    "q_stats_agg" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"),
          min(col("l_quantity")).as("min_q"),
          max(col("l_quantity")).as("max_q"))),
    "q_percentile" -> ((s, d) =>
      // exact interpolated percentiles (not percentile_approx: sketch
      // estimates are engine-specific and would never hash-match)
      Tables.lineitem(s, d).groupBy("l_linestatus")
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"))
        .select(col("l_linestatus"),
          round(element_at(col("ps"), 1), 4).as("p25"),
          round(element_at(col("ps"), 2), 4).as("p50"),
          round(element_at(col("ps"), 3), 4).as("p75"))),
    "q_regexp" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        col("p_name").rlike("^[a-m]").as("first_half"),
        translate(col("p_type"), "AEIOU", "aeiou").as("type_lower_vowels"),
        repeat(col("p_brand"), 2).as("brand_twice"))),
    "q_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority")).distinct()),
    // 1.9×, not 2×: the 2× threshold returned 0 rows on this data at
    // every gate scale factor, so the hash comparison was vacuous —
    // 1.9× yields a stable non-empty result (74 / 713 / 7351 rows at
    // sf0.001 / 0.01 / 0.1)
    "q_scalar_subquery" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql("""
        SELECT o_orderkey, o_totalprice AS price
        FROM orders
        WHERE o_totalprice > (SELECT 1.9 * avg(o_totalprice) FROM orders)""")
    }),
    "q_correlated_subquery" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql("""
        SELECT o.o_orderkey, o.o_totalprice AS price
        FROM orders o
        WHERE o.o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)""")
    }),
    "q_window_analytics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_orderkey")).over(wf).as("first_ok"),
        last(col("o_orderkey")).over(wf).as("last_ok"))
    }),
    "q_posexplode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(col("word") =!= "")),
    "q_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersectAll(
          o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    }),
    "q_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .exceptAll(
          o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    }),
    "q_string_agg" -> ((s, d) =>
      // deterministic list aggregation: sort before join — collect_list
      // order is partition-dependent and would never hash-match
      Tables.orders(s, d).groupBy(col("o_custkey").as("custkey"))
        .agg(concat_ws(",",
          sort_array(collect_list(col("o_orderpriority")))).as("priorities"),
          concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
            .as("statuses"))),
    "q_generate_series" -> ((s, d) =>
      // generator source: a calendar dimension from a sequence expression
      Tables.orders(s, d).sparkSession.range(1)
        .select(explode(expr(
          "sequence(to_date('2024-01-01'), to_date('2024-03-31'), interval 1 day)"))
          .as("d"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          (weekday(col("d")) + 1).as("isodow"),
          weekofyear(col("d")).as("week"))),
    "q_nullhandling" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("NONE")).as("rf"),
        when(col("l_tax").isNull, -1.0).otherwise(col("l_tax")).as("tax_nn")))
  )

  val oracles: Map[String, String] = Map(
    "q_pivot" -> """
      SELECT o_orderstatus AS status,
             COUNT(1) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
             COUNT(1) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
             COUNT(1) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
             COUNT(1) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
             COUNT(1) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
      FROM orders GROUP BY o_orderstatus""",
    "q_unpivot" -> """
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part""",
    "q_stats_agg" -> """
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 6) AS sd_qty,
             round(var_samp(l_quantity), 6) AS var_qty,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
             round(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
             min(l_quantity) AS min_q, max(l_quantity) AS max_q
      FROM lineitem GROUP BY l_returnflag""",
    "q_percentile" -> """
      SELECT l_linestatus,
             round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
      FROM lineitem GROUP BY l_linestatus""",
    "q_regexp" -> """
      SELECT p_partkey,
             regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             regexp_matches(p_name, '^[a-m]') AS first_half,
             translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
             repeat(p_brand, 2) AS brand_twice
      FROM part""",
    "q_distinct" -> """
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders""",
    "q_scalar_subquery" -> """
      SELECT o_orderkey, o_totalprice AS price
      FROM orders
      WHERE o_totalprice > (SELECT 1.9 * avg(o_totalprice) FROM orders)""",
    "q_correlated_subquery" -> """
      SELECT o.o_orderkey, o.o_totalprice AS price
      FROM orders o
      WHERE o.o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)""",
    "q_window_analytics" -> """
      SELECT o_custkey, o_orderkey,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cume,
             first_value(o_orderkey) OVER wf AS first_ok,
             last_value(o_orderkey) OVER wf AS last_ok
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "q_posexplode" -> """
      SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x,
           LATERAL unnest(generate_series(1, len(t))) AS u(i)
      WHERE t[i] <> ''""",
    "q_intersect_all" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    "q_except_all" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    "q_string_agg" -> """
      SELECT o_custkey AS custkey,
             array_to_string(list_sort(list(o_orderpriority)), ',') AS priorities,
             array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
      FROM orders GROUP BY o_custkey""",
    "q_generate_series" -> """
      SELECT strftime(d, '%Y-%m-%d') AS day,
             CAST(isodow(d) AS INTEGER) AS isodow,
             CAST(weekofyear(d) AS INTEGER) AS week
      FROM (SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-03-31',
                                          INTERVAL 1 DAY))::DATE AS d)""",
    "q_nullhandling" -> """
      SELECT l_orderkey, l_linenumber,
             nullif(l_discount, 0.0) AS disc_or_null,
             coalesce(nullif(l_returnflag, 'N'), 'NONE') AS rf,
             CASE WHEN l_tax IS NULL THEN -1.0 ELSE l_tax END AS tax_nn
      FROM lineitem"""
  )
}
