package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval — fusing ranked lists from heterogeneous scorers
  * (term-based BM25, embedding cosine, …) into one leaderboard.
  *
  * Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09): a
  * document's fused score is Σ_legs 1/(κ + rank_leg) over the legs that
  * retrieved it. RRF works on RANKS, not scores, so it needs no
  * per-leg score normalization — the property that makes it the
  * standard first fusion for BM25 + dense retrieval, whose score scales
  * are incomparable.
  *
  * Scale design: each input leg is already k-bounded PER QUERY (the
  * legs' own TopK buffers did the corpus-sized work), so fusion sees at
  * most |legs| × fetchK rows per query — the union + groupBy here moves
  * kilobytes per query at any corpus size, and the final cut runs
  * through the same bounded [[TopK.TopKAgg]]. Arithmetic is integer
  * micro-units (10⁶ div (κ + rank)) — exact, associative, replayable
  * bit-for-bit by an external engine; ranks ≥ 1 and κ ≥ 0 keep the
  * divisor positive. */
object Retrieval {

  /** Fuse ranked legs, each with columns (query_id, doc_id, rk), into
    * the top-`k` per query by RRF score. Returns (query_id, doc_id,
    * rrf_micro, rk) in total order (rrf_micro desc, doc_id asc). */
  def rrfFuse(legs: Seq[DataFrame], k: Int, kappa: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse: need at least one ranked leg")
    require(k >= 1, s"rrfFuse: k must be >= 1, got $k")
    require(kappa >= 0, s"rrfFuse: kappa must be >= 0, got $kappa")
    val contribs = legs.map(_.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      expr(s"cast(1000000 as bigint) div ($kappa + cast(rk as bigint))")
        .as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).as("rrf_micro"))
    TopK.topKPerGroup(fused, "query_id", "doc_id", "rrf_micro", k)
      .select(col("query_id"), col("doc_id"),
        col("rrf_micro").cast("long").as("rrf_micro"), col("rk"))
  }
}
