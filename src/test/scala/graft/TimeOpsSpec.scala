package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity, TimeOps}
import graft.sources.Tables

class TimeOpsSpec extends AnyFunSuite with SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("packed as-of join equals the join+window formulation") {
    val fast = SparkEntry.queries("q_join_asof_fast")(spark, dir)
    val slow = SparkEntry.queries("q_join_asof")(spark, dir)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("as-of join keeps left rows with no match as null") {
    import spark.implicits._
    val left = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-05 00:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1L, "2024-01-02 00:00:00", 100L)) // after left row 1
      .toDF("k", "t", "v").withColumn("t", col("t").cast("timestamp"))
    val out = TimeOps.asofJoin(left, right, "k", "k", "t", "t", Seq("v"))
    val m = out.select(col("k"), col("asof.v")).as[(Long, Option[Long])]
      .collect().toMap
    assert(m(1L).isEmpty) // only right row is later than left t
    assert(m(2L).isEmpty) // key 2 has no right rows at all
  }
}

class NewDedupOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("ngram Jaccard finds the same planted near-dups as minhash") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ng = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // both are candidate generators for the same >=0.5 Jaccard truth;
    // on this corpus every true pair shares rare shingles and collides
    assert(ng == mh)
  }

  test("duplicate clusters are transitive closures with min labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(10L) == 10L && out(11L) == 10L)
  }

  test("distributed label propagation (large-graph path) matches union-find") {
    // smallGraphThreshold = 0 forces the distributed loop
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val dist = Dedup.duplicateClusters(chain, maxRounds = 20,
      smallGraphThreshold = 0L).as[(Long, Long)].collect().toMap
    val uf = Dedup.duplicateClusters(chain).as[(Long, Long)].collect().toMap
    assert(dist == uf && dist.size == 13 && dist.values.forall(_ == 0L))
  }

  test("duplicate clusters throw past maxRounds instead of silently wrong") {
    // a chain 0-1-2-...-12 has diameter 12: throws loudly when the
    // distributed path is capped below what convergence needs
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxRounds = 2, smallGraphThreshold = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("rolling min hash matches the direct polynomial, null when short") {
    import graft.functions.exprs
    import graft.functions.RollingMinHash.{B, M}
    def poly(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * B + c.toInt) % M)
    // single window: fp == polynomial of the whole string
    val one = Seq(Tuple1("abcdefgh")).toDF("text")
      .select(exprs.rolling_min_hash(col("text"), 8)).as[Long].head()
    assert(one == poly("abcdefgh"))
    // two windows: min of both polynomials (rolling update correctness)
    val two = Seq(Tuple1("abcdefghi")).toDF("text")
      .select(exprs.rolling_min_hash(col("text"), 8)).as[Long].head()
    assert(two == math.min(poly("abcdefgh"), poly("bcdefghi")))
    // short text → null
    val short = Seq(Tuple1("abc")).toDF("text")
      .select(exprs.rolling_min_hash(col("text"), 8)).collect()
    assert(short(0).isNullAt(0))
  }

  test("IVF results are a subset of brute-force candidates with sane ranks") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivf = Similarity.ivfTopK(e, e.filter(col("vec_id") < 2), 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => r._4 >= 1 && r._4 <= 5))
    val bf = Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 2), 5)
      .as[(Long, Long, Double, Int)].collect()
    // approximate recall: every IVF hit's sim is <= the brute-force top-1
    val bfTop = bf.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    assert(ivf.forall(r => r._3 <= bfTop(r._1) + 1e-9))
  }
}
