package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §2.9 scale notes).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when one key dominates so heavily that even split
  * partitions overwhelm a task, or when AQE is unavailable (streaming
  * joins). Salting trades `saltFactor`× replication of the small side
  * for an even distribution of the large side.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted: the large side gets a
    * random salt in [0, saltFactor), the small side is replicated once
    * per salt value, and the join key becomes (key, salt). Result equals
    * the plain inner join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    val l = large.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val s = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-n most frequent values of `c` — for choosing between plain,
    * AQE-split and salted joins from observed key histograms. */
  def keyHistogram(df: DataFrame, c: Column, topN: Int = 20): DataFrame =
    df.groupBy(c.as("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc).limit(topN)
}
