package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint auditing — the dbt-test /
  * Deequ-shaped "is this table still sane" pass a warehouse runs after
  * every load. The reference pipeline's only integrity mechanism is the
  * sink DDL (`dags/queries/ddl_orders_tbl.sql:4` PRIMARY KEY; NOT NULL
  * is absent) — violations there surface as load-time Postgres errors.
  * At 100 TB the audit must instead be a QUERY: scan once, count every
  * violation class, emit a bounded report (one row per constraint).
  *
  * Scale design:
  *   - All ROW-LOCAL checks against the same table (not-null, range,
  *     accepted-values, regex) fold into ONE conditional-sum aggregate
  *     — one scan per table regardless of how many checks it carries,
  *     zero joins, full partial aggregation (the report is |checks|
  *     rows; nothing corpus-sized moves).
  *   - Uniqueness is one hash-groupBy on the key: violations = rows
  *     beyond the first per key = n - distinct(n), computed as a
  *     two-column aggregate over the grouped counts.
  *   - Referential integrity is a left-anti join of the child's foreign
  *     keys against the parent's primary keys — the parent side reduces
  *     to DISTINCT keys first (dimension-bounded), so Spark broadcasts
  *     it and the check never shuffles the fact table.
  */
object Quality {

  /** One row-local predicate check: `violated` must be a deterministic
    * row predicate that is TRUE when the row VIOLATES the constraint
    * (null-safe: evaluate to true/false, never null). */
  final case class RowCheck(name: String, violated: Column)

  private val reportCols = Seq("constraint_name", "violations")

  /** All row-local checks for one table in a single scan: each check
    * contributes `sum(violated ? 1 : 0)`; the wide one-row aggregate is
    * then unpivoted to (constraint_name, violations) via `stack` — a
    * |checks|-row result, driver-safe by construction. */
  def rowChecks(df: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "rowChecks: need at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"rowChecks: duplicate check names in ${checks.map(_.name)}")
    // names are spliced into stack()'s SQL below — restrict to a safe
    // alphabet instead of escaping (a quote or backtick would break,
    // or worse silently re-parse, the generated expression)
    checks.foreach(c => require(
      c.name.nonEmpty && c.name.forall(ch =>
        ch.isLetterOrDigit || "_:.,<>=[]()/ -".contains(ch)),
      s"rowChecks: check name '${c.name}' contains characters outside " +
        "the safe set (letters, digits, '_:.,<>=[]()/ -')"))
    // coalesce the sum itself: over an EMPTY table sum() is NULL, and
    // an audit must report 0 violations there, not a null row
    val aggs = checks.map(c =>
      coalesce(sum(when(coalesce(c.violated, lit(true)), 1L).otherwise(0L)),
        lit(0L)).as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map(c => s"'${c.name}', `${c.name}`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${checks.size}, $stackArgs) AS (constraint_name, violations)")
  }

  /** Standard row-local constraint builders (violation predicates). */
  def notNull(colName: String): RowCheck =
    RowCheck(s"not_null:$colName", col(colName).isNull)

  def acceptedValues(colName: String, values: Seq[String]): RowCheck =
    RowCheck(s"accepted_values:$colName",
      !col(colName).isin(values.map(lit): _*) || col(colName).isNull)

  def inRange(colName: String, lo: Double, hi: Double): RowCheck =
    RowCheck(s"in_range:$colName",
      col(colName).isNull ||
        col(colName).cast("double") < lo || col(colName).cast("double") > hi)

  def matchesRegex(colName: String, pattern: String): RowCheck =
    RowCheck(s"matches_regex:$colName",
      col(colName).isNull || !col(colName).rlike(pattern))

  /** Uniqueness: violations = rows in excess of one per key value
    * (NULL keys are counted as violations outright — SQL UNIQUE ignores
    * them, but a warehouse key audit wants them loud). One groupBy on
    * the key (partial-agg combines per partition) plus a bins-bounded
    * second fold. */
  def unique(df: DataFrame, colName: String): DataFrame = {
    val perKey = df.groupBy(col(colName).as("__k"))
      .agg(count(lit(1)).as("__n"))
    perKey.agg(
      (sum(when(col("__k").isNotNull, col("__n") - 1).otherwise(col("__n"))))
        .as("violations"))
      .select(lit(s"unique:$colName").as("constraint_name"),
        coalesce(col("violations"), lit(0L)).as("violations"))
  }

  /** Referential integrity: child rows whose `fkCol` has no match in
    * the parent's `pkCol` (NULL foreign keys violate — same loud-audit
    * stance as [[unique]]). Parent reduces to distinct keys before the
    * anti-join; the parent is caller data, not structurally small
    * (TPC-H customer grows with scale factor), so no forced broadcast
    * hint — AQE converts the anti-join to broadcast when the measured
    * distinct-key side fits (rare-gram precedent). */
  def refIntegrity(child: DataFrame, fkCol: String,
                   parent: DataFrame, pkCol: String): DataFrame = {
    val pk = parent.select(col(pkCol).as("__pk")).distinct()
    child.select(col(fkCol).as("__fk"))
      .join(pk, col("__fk") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"ref_integrity:$fkCol->$pkCol").as("constraint_name"),
        col("violations"))
  }

  /** Assemble a full audit report: union of per-family reports, ordered
    * by constraint name for a stable, bounded (|checks| rows) result.
    * Constraint names must be globally unique across the report — the
    * builders name checks by column only, so the SAME check on two
    * tables collides; callers auditing multiple tables with overlapping
    * column names should disambiguate via [[RowCheck]]'s name (e.g.
    * `not_null:orders.id`). The collision is checked eagerly (a
    * |checks|-sized collect at plan-build time) because a keyed
    * consumer of the report would otherwise silently drop rows. */
  def report(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "report: need at least one part")
    val unioned = parts.map(_.select(reportCols.map(col): _*))
      .reduce(_ unionByName _)
    // collision guard IN-PLAN (raise_error), not via a pre-collect —
    // a driver-side check would execute every audit scan twice; the
    // window here runs over the already-aggregated |checks| rows
    val dupCount = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("constraint_name"))
    unioned
      .withColumn("violations",
        when(dupCount > 1, raise_error(concat(
          lit("Quality.report: constraint name collides across parts: "),
          col("constraint_name"),
          lit(" — disambiguate via RowCheck(name, ...)"))))
          .otherwise(col("violations")))
      .orderBy("constraint_name")
  }

  /** Snapshot-over-snapshot drift report — the dataset-shift alarm an
    * ingest pipeline needs BETWEEN loads: the constraint audit above
    * answers "is this table sane", this answers "is this table still
    * the SAME table" (an upstream dump that silently lost a language,
    * truncated a text field, or re-encoded a column passes every
    * row-local constraint while shifting the distribution a training
    * run inherits). Compares one profile row per snapshot:
    *
    *   - table level: `rows`;
    *   - per NUMERIC column: `nulls`, `min`, `max`, `sum` (cast to
    *     long — the drift signal is magnitude, and integer metrics
    *     keep the report engine-exact);
    *   - per STRING column: `nulls`, `bytes` (total `octet_length` —
    *     byte-exact across engines where character semantics differ,
    *     and the truncation/re-encoding tell).
    *
    * Every metric row carries `delta_permille =
    * |new−old|·1000 div max(|old|, 1)` (pure integer — no float
    * tolerance to argue about) and `status = WARN` past
    * `tolPermille`, else OK. Empty-snapshot metrics coalesce to 0.
    *
    * Scale: ONE conditional-sum scan per snapshot — the same
    * one-pass shape as [[rowChecks]] — then a driver-side assembly of
    * the (2 + 4·numCols + 2·strCols)-row report; nothing corpus-sized
    * moves, no joins, no windows. */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame,
                   numCols: Seq[String], strCols: Seq[String] = Nil,
                   tolPermille: Long = 100L): DataFrame = {
    require(numCols.nonEmpty || strCols.nonEmpty,
      "profileDrift: need at least one column to profile")
    require(tolPermille >= 0,
      s"profileDrift: tolPermille must be >= 0, got $tolPermille")
    val spark = oldDf.sparkSession
    // metric labels and aggregate expressions are built from the SAME
    // list and read back BY POSITION — no name round-trip, so a column
    // name containing the separator (or literally named "rows") can
    // never mis-key the report
    val metrics: Seq[(String, String, Column)] =
      Seq(("__table__", "rows", count(lit(1)))) ++
        numCols.flatMap(c => Seq(
          (c, "nulls", count(when(col(c).isNull, lit(1)))),
          (c, "min", coalesce(min(col(c).cast("long")), lit(0L))),
          (c, "max", coalesce(max(col(c).cast("long")), lit(0L))),
          (c, "sum", coalesce(sum(col(c).cast("long")), lit(0L))))) ++
        strCols.flatMap(c => Seq(
          (c, "nulls", count(when(col(c).isNull, lit(1)))),
          (c, "bytes",
            coalesce(sum(octet_length(col(c)).cast("long")), lit(0L)))))
    def profile(df: DataFrame): Seq[Long] = {
      val aggs = metrics.zipWithIndex.map { case ((_, _, e), i) =>
        e.as(s"m$i")
      }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      metrics.indices.map(r.getLong)
    }
    val (o, n) = (profile(oldDf), profile(newDf))
    import spark.implicits._
    metrics.zipWithIndex.map { case ((c, m, _), i) =>
      val (ov, nv) = (o(i), n(i))
      // the delta in BigInt: |nv - ov| * 1000 overflows Long once a
      // metric passes ~9.2e15 (total text BYTES at large scale gets
      // there), and the wrapped negative would silently report OK on
      // a catastrophic shift. Clamp the (already astronomically
      // off-tolerance) quotient at Long.MaxValue.
      val dpmB = (BigInt(nv) - BigInt(ov)).abs * 1000 /
        BigInt(math.max(math.abs(ov), 1L))
      val dpm = if (dpmB > Long.MaxValue) Long.MaxValue else dpmB.toLong
      (c, m, ov, nv, dpm, if (dpm > tolPermille) "WARN" else "OK")
    }.toDF("col_name", "metric", "old_v", "new_v",
      "delta_permille", "status")
  }
}
