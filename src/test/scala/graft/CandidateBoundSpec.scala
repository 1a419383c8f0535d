package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.Tables

/** Ties the `docs/SCALING.md` df-cap candidate-count derivation to a
  * MEASURED candidate count at sf0.1 (the scale the bench gate runs):
  * the rare-shingle inverted index must generate no more distinct pairs
  * than Σ C(df, 2) over the surviving shingles, which in turn is bounded
  * by postings · (maxDf − 1) / 2 — the closed form the doc tells
  * operators to budget shuffle bytes with. If candidate generation ever
  * regresses to something super-linear in the posting list (a lost df
  * cap, a broken distinct), this fails before it becomes a 100 TB
  * shuffle explosion. */
class CandidateBoundSpec extends AnyFunSuite with SparkSpec {

  test("rare-shingle candidates obey the SCALING.md df-cap bound at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val maxDf = 20
    val measured = Dedup.rareShingleCandidates(docs, "doc_id", "text", maxDf)
      .select("doc_a", "doc_b").count()
    // independent df histogram over the same shingle expression
    val stats = Dedup.shingleHashesFlat(docs, "doc_id", "text")
      .select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .agg(sum(col("df") * (col("df") - 1)).as("pair_bound2"),
        sum(col("df")).as("postings"))
      .head()
    val pairBound = stats.getLong(0) / 2
    val postings = stats.getLong(1)
    assert(measured > 0, "candidate stage produced nothing at sf0.1")
    // each unordered pair is counted once even when it shares many
    // shingles, so the per-shingle sum is a true upper bound
    assert(measured <= pairBound,
      s"measured $measured candidates exceed the Σ C(df,2) bound $pairBound")
    // and the closed form from the doc dominates the exact sum
    assert(pairBound <= postings * (maxDf - 1) / 2,
      s"Σ C(df,2)=$pairBound exceeds postings·(maxDf−1)/2=" +
        s"${postings * (maxDf - 1) / 2}")
  }
}
