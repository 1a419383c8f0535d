package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar/relational operators reproducing the reference's transform
  * semantics (SURVEY §2.3/§2.4) as Catalyst column expressions — no UDFs.
  */
object RefOps {

  /** P5 — categorical normalization: {'Male'→'M', 'f'→'F'}, everything
    * else passes through (reference `dags/etl.py:60`). Idempotent. */
  def normalizeGender(c: Column): Column =
    when(c === "Male", "M").when(c === "f", "F").otherwise(c)

  /** P6 — ISO timestamp-string → date-string truncation:
    * `1967-02-20T00:00:00` → `1967-02-20`; strings without 'T' are
    * unchanged (reference `dags/etl.py:63-64`, `split('T')[0]`). */
  def truncateIsoDate(c: Column): Column = substring_index(c, "T", 1)

  /** P1 — positional bulk rename (reference `df.columns = [...]`,
    * `dags/etl.py:55`). */
  def renameAll(df: DataFrame, names: Seq[String]): DataFrame =
    df.toDF(names: _*)

  /** J2/J3 — inner equi-join on differently-named keys with pandas
    * `merge`-style deterministic collision naming: columns present on
    * both sides (including the right key if it collides) get `_x`
    * (left) / `_y` (right) suffixes; the reference relies on this for
    * `Name_x` = product name (`dags/etl.py:108-118`).
    *
    * Spark has no auto-suffixing, so the engine pins the pandas output
    * schema explicitly (SURVEY §7.3). Plain column renames — stays fully
    * inside whole-stage codegen, zero extra shuffles. */
  def joinPandas(left: DataFrame, right: DataFrame,
                 leftOn: String, rightOn: String,
                 how: String = "inner"): DataFrame = {
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    val l = collisions.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + "_x"))
    val r = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_y"))
    val lk = if (collisions.contains(leftOn)) leftOn + "_x" else leftOn
    val rk = if (collisions.contains(rightOn)) rightOn + "_y" else rightOn
    l.join(r, l(lk) === r(rk), how)
  }

  /** J1 — inner equi-join on a same-named key; pandas `on=` collapses the
    * key to a single column, other collisions get suffixed
    * (`dags/etl.py:84-86`). Spark's `Seq(key)` form matches the key
    * dedup; suffix the rest. */
  def joinPandasOn(left: DataFrame, right: DataFrame, on: String,
                   how: String = "inner"): DataFrame = {
    val collisions = left.columns.toSet.intersect(right.columns.toSet) - on
    val l = collisions.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + "_x"))
    val r = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_y"))
    l.join(r, Seq(on), how)
  }
}
