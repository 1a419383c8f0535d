package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-items (heavy-hitters) sketching — the one-pass, bounded-state
  * answer to "which keys are hot?" that a 100 TB pipeline needs BEFORE it
  * can decide to salt a join or divert a mega-bucket: the exact
  * `groupBy(key).count` it replaces shuffles one row per distinct key,
  * which is exactly the thing you cannot afford when the point of asking
  * is that the key space is huge.
  *
  * The sketch is Misra–Gries (k counters), with the mergeable-summaries
  * merge (Agarwal et al. 2012, "Mergeable Summaries"): pointwise-sum two
  * sketches, then subtract the (k+1)-th largest counter from all and drop
  * the non-positive. Both reduce and merge maintain the invariant
  *
  *   true_count − N/(k+1)  ≤  estimate  ≤  true_count
  *
  * over the TOTAL stream length N, regardless of how Spark partitions the
  * data or in what order partial buffers merge — which is what makes it
  * safe as a typed `Aggregator` under partial aggregation: each map task
  * builds a ≤ k-entry sketch, and only those bounded buffers cross the
  * shuffle (the [[TopK]] argument, applied to frequency estimation).
  * Consequences used by the oracle gate:
  *   - any item with true count > N/(k+1) is PRESENT in the sketch;
  *   - estimates never overcount.
  */
object FreqSketch {

  /** Misra–Gries with k counters over string items. The buffer is an
    * immutable map bounded at k entries; reduce is O(1) amortized (the
    * O(k) decrement happens at most once per k increments), merge is
    * O(k) — both independent of stream length. */
  class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"MisraGriesAgg: k must be >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      b.get(item) match {
        case Some(c)            => b.updated(item, c + 1L)
        case None if b.size < k => b.updated(item, 1L)
        // full and unseen: decrement every counter (the incoming item's
        // implicit counter hits zero immediately) — k+1 stream units are
        // discarded together, which is where the N/(k+1) bound comes from
        case None =>
          b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
      }

    override def merge(x: Map[String, Long],
                       y: Map[String, Long]): Map[String, Long] = {
      if (x.isEmpty) return y
      if (y.isEmpty) return x
      val m = (x.keySet ++ y.keySet).iterator
        .map(t => t -> (x.getOrElse(t, 0L) + y.getOrElse(t, 0L))).toMap
      if (m.size <= k) m
      else {
        // subtract the (k+1)-th largest count from everything: ≥ k+1
        // counters each give up `cut` units, preserving the error bound
        val cut = m.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)(k)
        m.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Sketch the item frequencies of `itemCol` in one pass: (item, est),
    * at most k rows. The global aggregate runs with partial aggregation —
    * bounded sketch per map partition, merged once — so nothing
    * proportional to the item count or the distinct-item count crosses
    * the shuffle. */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val agg = udaf(new MisraGriesAgg(k),
      org.apache.spark.sql.Encoders.STRING)
    items.select(col(itemCol).cast("string").as("item"))
      .agg(agg(col("item")).as("sk"))
      .select(explode(col("sk")).as(Seq("item", "est")))
  }
}
