package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Core relational operator battery over the driver testdata, each with a
  * DuckDB oracle (driver contract — `Verify.scala`). Covers the reference's
  * semantic surface (scans, projections, renames, chained inner equi-joins
  * — SURVEY §2.1–§2.4) plus the standard engine categories the reference
  * lacks (SURVEY §2.5/§2.6, built here from stock Spark per §2.9).
  *
  * Scale notes (100 TB stance):
  *  - dimension joins (`nation`, `region`, price bands) carry explicit
  *    `broadcast()` hints — the fact side never shuffles for them;
  *  - larger joins (orders⋈customer, lineitem⋈part) are left to Catalyst
  *    + AQE, which picks broadcast vs shuffled-hash vs sort-merge by
  *    observed size — correct at any scale factor;
  *  - every aggregate is algebraic (partial/map-side combine applies);
  *  - money SUMs accumulate in fixed decimals (order-independent, exact
  *    under 1000-way parallelism — double summation is order-dependent)
  *    and only the final result is cast to double.
  *
  * Output-type convention (oracle hash stability): results carry only
  * bigint / double / string columns — decimals, dates and timestamps
  * render differently across the parquet/DuckDB/pandas hops.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** Exact decimal accumulation, double result. */
  private def sumDec(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private def day(c: Column): Column = date_format(c, "yyyy-MM-dd")

  val defs: Map[String, Q] = Map(
    // ---- reference-pipeline analogues (SURVEY §3.2/§3.3) ----
    "ref_orders_enriched" -> ((s, d) => {
      // fact ⋈ dim ⋈ dim with projection+rename — the reference's entire
      // semantic core (J2+J3+P2+P3) on the testdata star schema.
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val su = Tables.supplier(s, d)
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .select(li("l_orderkey").as("order_id"),
          li("l_linenumber").as("line_no"),
          p("p_name").as("product_name"),
          p("p_brand").as("brand"),
          su("s_name").as("supplier_name"),
          li("l_quantity").as("quantity"),
          li("l_extendedprice").as("price"))
    }),
    "ref_users_enriched" -> ((s, d) => {
      // users ⋈ demographics analogue (J1) with bulk renames (P1); nation
      // and region are classic broadcast dims.
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(c("c_custkey").as("id"), c("c_name").as("name"),
          n("n_name").as("nation"), r("r_name").as("region"),
          c("c_mktsegment").as("segment"), c("c_acctbal").as("acctbal"))
    }),
    "ref_products_passthrough" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey").as("id"),
        col("p_name").as("name"), col("p_brand").as("brand"),
        col("p_type").as("type"), col("p_size").as("size"),
        col("p_retailprice").as("price"))),
    // K2 STRICT: the load artifact as statement TEXT (df_to_sql.py:1-14)
    // in both reference forms — with a column list (the orders load) and
    // without (the double-space quirk of the users/products loads). An
    // injected apostrophe exercises the \' escape on every nation row.
    "ref_insert_literal" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val withCols = graft.sources.Sinks.insertStatement(
        n.select(col("n_nationkey").cast("string").as("id"),
          concat(col("n_name"), lit("'s")).as("name"),
          col("n_regionkey").cast("string").as("region")),
        "airflow_db.airflow.nations", Seq("ID", "NAME", "REGION"),
        col("id").cast("long"))
      val r = Tables.region(s, d)
      val noCols = graft.sources.Sinks.insertStatement(
        r.select(col("r_regionkey").cast("string").as("id"),
          col("r_name").as("name")),
        "airflow_db.airflow.regions", Nil, col("id").cast("long"))
      withCols.select(lit("with_columns").as("variant"), col("stmt"))
        .unionByName(noCols.select(lit("no_columns").as("variant"), col("stmt")))
    }),

    // ---- filters / scalar transforms ----
    "q_filter_scan" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_quantity").between(10, 20) && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"),
          day(col("l_shipdate")).as("ship_date"), col("l_quantity"))),
    "q_case_when" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("band",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("band").agg(count(lit(1)).as("n_orders"),
          sumDec(col("o_totalprice"), 2).as("total"))),
    "q_scalar_string" -> ((s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        lpad(col("p_brand"), 12, "#").as("brand_pad"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        reverse(col("p_brand")).as("brand_rev"),
        substring_index(col("p_type"), " ", 1).as("type_first"))),
    "q_scalar_date" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        day(col("o_orderdate")).as("order_date"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("day"),
        quarter(col("o_orderdate")).as("q"),
        day(date_add(to_date(col("o_orderdate")), 30)).as("plus30"),
        day(last_day(col("o_orderdate"))).as("month_end"),
        datediff(lit("1998-01-01").cast("date"), to_date(col("o_orderdate")))
          .as("days_to_98"))),
    "q_scalar_math" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        round(abs(col("l_discount") - 0.05), 2).as("disc_dev"),
        (col("l_orderkey") % 7).as("key_mod"),
        round(log(col("l_extendedprice") + 1), 6).as("price_ln"))),

    // ---- aggregation ----
    "q1_agg" -> ((s, d) =>
      // TPC-H Q1 shape: algebraic aggs only — partial aggregation handles
      // the 100 TB fact side; the group domain is tiny (RF×LS).
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sumDec(col("l_quantity"), 2).as("sum_qty"),
          sumDec(col("l_extendedprice"), 2).as("sum_base_price"),
          sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))),
    "q_group_distinct" -> ((s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))),
    "q_rollup" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(su, li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(r("r_name").as("region"), n("n_name").as("nation"))
        .agg(sumDec(col("l_extendedprice"), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),
    "q_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
        .agg(count(lit(1)).as("n"), sumDec(col("l_quantity"), 2).as("qty"))),
    "q_grouping_sets" -> ((s, d) => {
      Tables.registerViews(s, d)
      s.sql("""
        SELECT c_mktsegment AS segment, n_name AS nation, COUNT(1) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())""")
    }),
    "q_having" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_partkey")
        .agg(sumDec(col("l_quantity"), 2).as("total_qty"),
          count(lit(1)).as("n_lines"))
        .filter(col("n_lines") >= 30)),
    "q_approx_distinct" -> ((s, d) => {
      // HLL++ sketch vs exact, paired per column — mergeable across
      // 1000 executors. Estimates are engine-specific, so the gate
      // asserts a TOLERANCE instead of a value: the exact counts are
      // integers (hash-safe across engines — DuckDB recomputes them
      // independently) and the verdict columns pin |approx − exact| ≤
      // 5%·exact at rsd 0.01 (the default 0.05 means a ±5% bound is
      // one-sigma — it measurably fails on the orders column at
      // sf0.001; 0.01 buys 5 sigma of slack for 2^14 registers, still
      // a constant-size mergeable sketch). The exact legs exist for
      // the gate — at 100 TB only the approx columns survive.
      //
      // ONE aggregate function per scan, 1-row frames joined. Anything
      // denser degrades: two different-column exact distincts in one
      // aggregate plan a 3× Expand of the fact table (measured 35 s at
      // sf0.1), and pairing the HLL with a distinct agg makes the
      // one-distinct rewrite carry a per-distinct-VALUE HLL buffer
      // through its phase-1 aggregate — 16 KB × |distinct| of
      // allocation (measured 10.8 s). Four clean scans are ~0.3 s each
      // and each is the plan you would actually run at 100 TB.
      val li = Tables.lineitem(s, d)
      def exact(c: String, a: String) =
        li.agg(countDistinct(col(c)).as(s"exact_$a"))
      def approx(c: String, a: String) =
        li.agg(approx_count_distinct(col(c), 0.01).as(s"approx_$a"))
      def within(a: String) =
        (abs(col(s"approx_$a") - col(s"exact_$a"))
          <= col(s"exact_$a").cast("double") * 0.05).cast("int")
      exact("l_partkey", "parts").crossJoin(approx("l_partkey", "parts"))
        .crossJoin(exact("l_orderkey", "orders"))
        .crossJoin(approx("l_orderkey", "orders"))
        .select(col("exact_parts"), col("exact_orders"),
          within("parts").as("parts_within_5pct"),
          within("orders").as("orders_within_5pct"))
    }),

    // ---- window functions ----
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").as("price"), col("rk"), col("drk"))
    }),
    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("price"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
    }),
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_total"))
    }),
    "q_window_moving_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, Window.currentRow)
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        round(avg(col("o_totalprice")).over(w), 6).as("avg3"))
    }),
    "q_topk" -> ((s, d) =>
      // Global top-k: per-partition local top-k then a single tiny merge —
      // Spark's TakeOrderedAndProject, no full sort of the fact table.
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").as("price"))),

    // ---- join breadth ----
    "q_join_left" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey").as("custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"),
          coalesce(sum(o("o_totalprice").cast(DecimalType(18, 2))), lit(0))
            .cast("double").as("total_spent"))
    }),
    "q_join_full" -> ((s, d) => {
      val nc = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val ns = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      nc.join(ns, Seq("nk"), "full")
        .select(col("nk").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),
    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q_join_anti" -> ((s, d) => {
      // parts never shipped by supplier #1 — anti join with a nonempty
      // result at every scale factor.
      val p = Tables.part(s, d)
      val li = Tables.lineitem(s, d).filter(col("l_suppkey") === 1)
        .select(col("l_partkey").as("p_partkey"))
      p.join(li, Seq("p_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
    }),
    "q_join_range" -> ((s, d) => {
      // Non-equi range join against a tiny band dim — broadcast so the
      // fact side is a single codegen'd pass (BroadcastNestedLoopJoin).
      val bands = s.createDataFrame(Seq(
        ("p00_050k", 0d, 50000d), ("p05_150k", 50000d, 150000d),
        ("p15_300k", 150000d, 300000d), ("p30_inf", 300000d, 1e18)))
        .toDF("band", "lo", "hi")
      val o = Tables.orders(s, d)
      o.join(broadcast(bands),
          o("o_totalprice") >= bands("lo") && o("o_totalprice") < bands("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice"), 2).as("total"))
    }),
    "q_join_asof" -> ((s, d) => {
      // As-of join: latest order at-or-before each event's timestamp for
      // that user. Composed as range-join + per-event top-1 (SURVEY §2.9);
      // at scale the window dedup shuffles once on event_id.
      val e = Tables.events(s, d)
      val o = Tables.orders(s, d)
      val joined = e.join(o,
        e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"), "inner")
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_orderkey"),
          day(col("o_orderdate")).as("last_orderdate"))
    }),

    // ---- set operations ----
    "q_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .union(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    }),
    "q_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .intersect(
          o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    }),
    "q_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
    }),

    // ---- nested data ----
    "q_explode" -> ((s, d) =>
      // S2-analogue: string → array → explode → aggregate (the reference's
      // json_normalize flatten maps to the same explode machinery).
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))),
    "q_json" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k")))
  )

  /** DuckDB dialect; runs against views named after the parquet tables.
    * Aliases and types are pinned to the Spark outputs: bigint / double /
    * string only (see the output-type convention above). */
  val oracles: Map[String, String] = Map(
    // tolerance oracle: DuckDB recomputes the EXACT counts (integers —
    // hash-safe), and the literal-1 verdict columns force the Spark
    // side's |approx − exact| ≤ 5% assertion to hold
    "q_approx_distinct" -> """
      SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             CAST(1 AS INT) AS parts_within_5pct,
             CAST(1 AS INT) AS orders_within_5pct
      FROM lineitem""",
    "ref_orders_enriched" -> """
      SELECT l_orderkey AS order_id, l_linenumber AS line_no,
             p_name AS product_name, p_brand AS brand,
             s_name AS supplier_name, l_quantity AS quantity,
             l_extendedprice AS price
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey""",
    "ref_users_enriched" -> """
      SELECT c_custkey AS id, c_name AS name, n_name AS nation,
             r_name AS region, c_mktsegment AS segment, c_acctbal AS acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey""",
    "ref_products_passthrough" -> """
      SELECT p_partkey AS id, p_name AS name, p_brand AS brand,
             p_type AS type, p_size AS size, p_retailprice AS price
      FROM part""",
    // statement-text parity: DuckDB rebuilds the same insert literal —
    // '''' is one quote, '\''' is backslash+quote (no backslash escapes
    // in standard SQL literals)
    "ref_insert_literal" -> """
      SELECT 'with_columns' AS variant,
             'insert into airflow_db.airflow.nations (ID,NAME,REGION) values '
             || string_agg(
                  '(''' || replace(CAST(n_nationkey AS VARCHAR), '''', '\''')
                  || ''',''' || replace(n_name || '''s', '''', '\''')
                  || ''',''' || replace(CAST(n_regionkey AS VARCHAR), '''', '\''')
                  || ''')', ',' ORDER BY n_nationkey)
             || ';' AS stmt
      FROM nation
      UNION ALL
      SELECT 'no_columns',
             'insert into airflow_db.airflow.regions  values '
             || string_agg(
                  '(''' || replace(CAST(r_regionkey AS VARCHAR), '''', '\''')
                  || ''',''' || replace(r_name, '''', '\''')
                  || ''')', ',' ORDER BY r_regionkey)
             || ';'
      FROM region""",
    "q_filter_scan" -> """
      SELECT l_orderkey, l_linenumber,
             strftime(l_shipdate, '%Y-%m-%d') AS ship_date, l_quantity
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'""",
    "q_case_when" -> """
      SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 150000 THEN 'medium'
                  ELSE 'large' END AS band,
             COUNT(1) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1""",
    "q_scalar_string" -> """
      SELECT p_partkey,
             upper(p_name) AS name_upper,
             substr(p_name, 1, 5) AS name_pre,
             CAST(length(p_name) AS INTEGER) AS name_len,
             replace(p_type, ' ', '_') AS type_snake,
             lpad(p_brand, 12, '#') AS brand_pad,
             concat_ws('|', p_brand, p_type) AS brand_type,
             reverse(p_brand) AS brand_rev,
             CASE WHEN strpos(p_type, ' ') > 0
                  THEN substr(p_type, 1, strpos(p_type, ' ') - 1)
                  ELSE p_type END AS type_first
      FROM part""",
    "q_scalar_date" -> """
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             CAST(year(o_orderdate) AS INTEGER) AS y,
             CAST(month(o_orderdate) AS INTEGER) AS m,
             CAST(day(o_orderdate) AS INTEGER) AS day,
             CAST(quarter(o_orderdate) AS INTEGER) AS q,
             strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                  AS INTEGER) AS days_to_98
      FROM orders""",
    "q_scalar_math" -> """
      SELECT l_orderkey, l_linenumber,
             round(sqrt(l_quantity), 6) AS qty_sqrt,
             CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             round(abs(l_discount - 0.05), 2) AS disc_dev,
             l_orderkey % 7 AS key_mod,
             round(ln(l_extendedprice + 1), 6) AS price_ln
      FROM lineitem""",
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             round(AVG(l_quantity), 6) AS avg_qty,
             COUNT(1) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""",
    "q_group_distinct" -> """
      SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs,
             COUNT(1) AS n_orders
      FROM orders GROUP BY o_orderpriority""",
    "q_rollup" -> """
      SELECT r_name AS region, n_name AS nation,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(1) AS n_lines
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)""",
    "q_cube" -> """
      SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(1) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q_grouping_sets" -> """
      SELECT c_mktsegment AS segment, n_name AS nation, COUNT(1) AS n
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())""",
    "q_having" -> """
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
             COUNT(1) AS n_lines
      FROM lineitem GROUP BY l_partkey HAVING COUNT(1) >= 30""",
    "q_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice AS price, rk, drk
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(rank() OVER w AS INTEGER) AS rk,
                   CAST(dense_rank() OVER w AS INTEGER) AS drk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey ASC)) t
      WHERE rk <= 3""",
    "q_window_lag" -> """
      SELECT o_custkey, o_orderkey, o_totalprice AS price,
             lag(o_totalprice, 1) OVER w AS prev_price,
             lead(o_totalprice, 1) OVER w AS next_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "q_window_running" -> """
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_total
      FROM orders""",
    "q_window_moving_avg" -> """
      SELECT o_custkey, o_orderkey,
             round(AVG(o_totalprice) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg3
      FROM orders""",
    "q_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice AS price
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_join_left" -> """
      SELECT c_custkey AS custkey, COUNT(o_orderkey) AS n_orders,
             CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey""",
    "q_join_full" -> """
      SELECT COALESCE(c.nk, s.nk) AS nationkey,
             COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nk, COUNT(1) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN
           (SELECT s_nationkey AS nk, COUNT(1) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk""",
    "q_join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_join_anti" -> """
      SELECT p_partkey, p_name, p_brand FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_partkey = p_partkey AND l_suppkey = 1)""",
    "q_join_range" -> """
      WITH bands(band, lo, hi) AS (VALUES
        ('p00_050k', 0, 50000), ('p05_150k', 50000, 150000),
        ('p15_300k', 150000, 300000), ('p30_inf', 300000, 1e18))
      SELECT band, COUNT(1) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band""",
    "q_join_asof" -> """
      SELECT event_id, user_id, o_orderkey AS last_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
      FROM (SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
                   row_number() OVER (PARTITION BY e.event_id
                     ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
            FROM events e
            JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
      WHERE rn = 1""",
    "q_union" -> """
      SELECT o_custkey, COUNT(1) AS n FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
      GROUP BY o_custkey""",
    "q_intersect" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    "q_except" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
    "q_explode" -> """
      SELECT word, COUNT(1) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE word <> '' GROUP BY word""",
    "q_json" -> """
      SELECT event_type, COUNT(1) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type"""
  )
}
