package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k as a typed `Aggregator` (SURVEY §2.9 scale notes).
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy(s))
  * <= k`) shuffles EVERY row of the fact table to sort each group. This
  * aggregator keeps at most k items per aggregation buffer, so with
  * partial aggregation only k rows per group PER MAP PARTITION cross the
  * shuffle — the difference between shuffling 100 TB and shuffling
  * (partitions × k) rows. Ordering is total (score desc, id asc) for
  * deterministic, oracle-comparable output.
  */
object TopK {

  /** One candidate: a score and a total-order tie-break id. */
  case class Scored(score: Double, id: Long)

  /** Typed aggregator keeping the k largest [[Scored]] per group.
    * Buffers stay sorted and bounded, so reduce is O(log k) search +
    * O(k) insert and merge is a bounded linear merge. */
  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private val ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.id))

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.length == k && ord.lteq(b.last, a)) b // below the current floor
      else {
        val i = b.indexWhere(x => ord.gt(x, a)) // first element ranked after a
        val at = if (i < 0) b.length else i
        (b.take(at) :+ a) ++ b.drop(at).take(k - at - 1)
      }

    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
      val out = Vector.newBuilder[Scored]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && ord.lteq(x(i), y(j)))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(r: Seq[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-k rows per group: `(group, id, score, rk)` with rk 1..k by
    * (score desc, id asc). `scoreCol` must be double, `idCol` long. */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), Encoders.product[Scored])
    df.select(col(groupCol).as("g"),
        col(scoreCol).cast("double").as("score"), col(idCol).as("id"))
      .groupBy("g")
      // product input encoder: the UDAF takes the Scored fields as
      // separate columns
      .agg(agg(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("g").as(groupCol), col("s.id").as(idCol),
        col("s.score").as(scoreCol), (col("i") + 1).cast("int").as("rk"))
  }

  /** One term candidate for [[TermTopKAgg]]: ranked by (tf desc,
    * df asc, term asc) — most frequent IN the document, rarest ACROSS
    * the corpus, lexicographic tie-break. The integer-only rank is
    * deliberately log-free: `tf·ln(N/df)` ordering needs float logs an
    * external oracle cannot reproduce bit-for-bit, while this total
    * order is exactly the TF-IDF ranking's shape on integer legs. */
  case class TermScored(tf: Long, df: Long, term: String)

  /** [[TopKAgg]]'s sibling for term ranking: same bounded sorted-buffer
    * mechanics (reduce O(log k) + O(k), bounded merge), different total
    * order and a string payload. */
  class TermTopKAgg(k: Int) extends Aggregator[TermScored, Seq[TermScored], Seq[TermScored]] {
    private val ord: Ordering[TermScored] =
      Ordering.by((t: TermScored) => (-t.tf, t.df, t.term))

    override def zero: Seq[TermScored] = Vector.empty

    override def reduce(b: Seq[TermScored], a: TermScored): Seq[TermScored] =
      if (b.length == k && ord.lteq(b.last, a)) b
      else {
        val i = b.indexWhere(x => ord.gt(x, a))
        val at = if (i < 0) b.length else i
        (b.take(at) :+ a) ++ b.drop(at).take(k - at - 1)
      }

    override def merge(x: Seq[TermScored], y: Seq[TermScored]): Seq[TermScored] = {
      val out = Vector.newBuilder[TermScored]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && ord.lteq(x(i), y(j)))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(r: Seq[TermScored]): Seq[TermScored] = r

    override def bufferEncoder: Encoder[Seq[TermScored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[TermScored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
