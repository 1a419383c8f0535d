package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimJoin}

/** Prefix-filter similarity-join laws: the lossless theorem (results
  * equal the brute-force all-pairs join, pair for pair), threshold
  * monotonicity, and the integer prefix-length arithmetic. */
class SimJoinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.documents(spark, dir)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  test("prefix filtering is lossless: equals brute-force all-pairs") {
    val got = pairs(SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 6, 10)
      .select("doc_a", "doc_b", "inter", "un"))
    // brute force over the same shingle sets
    val sets = Dedup.shingleHashesFlat(docs, "doc_id", "text")
      .filter(size(col("hs")) > 0)
    val brute = sets.select(col("doc_id").as("doc_a"), col("hs").as("ha"))
      .crossJoin(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter",
        graft.functions.exprs.intersect_count(col("ha"), col("hb"))
          .cast("long"))
      .withColumn("un",
        size(col("ha")).cast("long") + size(col("hb")) - col("inter"))
      .filter(col("inter") * 10 >= col("un") * 6)
      .select("doc_a", "doc_b", "inter", "un")
    assert(got == pairs(brute), "prefix join diverged from brute force")
    assert(got.nonEmpty, "fixture produced no qualifying pairs — gate is vacuous")
  }

  test("tighter thresholds return subsets") {
    val at50 = pairs(SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 5, 10)
      .select("doc_a", "doc_b", "inter", "un"))
    val at80 = pairs(SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 8, 10)
      .select("doc_a", "doc_b", "inter", "un"))
    assert(at80.subsetOf(at50))
  }

  test("threshold 1 (exact duplicates only) yields identical sets") {
    val dup = SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 1, 1)
      .collect()
    dup.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"threshold 1 admitted a non-identical pair: $r")
    }
  }
}
