package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Time-series operators (SURVEY §2.9): as-of join via packed per-key
  * timelines.
  *
  * The composition route (range join + per-row window top-1, see
  * `q_join_asof`) shuffles |left| × avg-matches rows. This operator
  * instead aggregates the right side into one sorted array per key
  * (shuffled once, compact), joins it to the left (broadcast when the
  * key domain is small), and picks the as-of row with an O(log n)
  * binary-search expression ([[graft.functions.SortedLastLE]]) — the
  * 100 TB shape: no row multiplication, one narrow pass over the fact
  * stream.
  */
object TimeOps {

  /** For each left row, the latest right row with `rightTime <=
    * leftTime` on the same key. Output: the left columns plus an `asof`
    * struct of `valueCols` (null when no right row qualifies).
    *
    * Right-side ties on time resolve to the greatest value tuple (the
    * sorted struct array orders (time, values…) lexicographically) —
    * the same pick as a `row_number` over (time desc, values desc). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val v = struct(valueCols.map(col): _*)
    val packed = right
      .groupBy(col(rightKey).as("__k"))
      .agg(sort_array(collect_list(struct(
        unix_micros(col(rightTime).cast("timestamp_ltz")).as("t"),
        v.as("v")))).as("tl"))
      .select(col("__k"),
        expr("transform(tl, x -> x.t)").as("__times"),
        expr("transform(tl, x -> x.v)").as("__vals"))
    val idx = graft.functions.exprs.sorted_last_le(
      col("__times"), unix_micros(col(leftTime).cast("timestamp_ltz")))
    left.join(packed, left(leftKey) === col("__k"), "left")
      .withColumn("__idx", idx)
      .withColumn("asof",
        when(col("__idx") > 0, element_at(col("__vals"), col("__idx"))))
      .drop("__k", "__times", "__vals", "__idx")
  }
}
