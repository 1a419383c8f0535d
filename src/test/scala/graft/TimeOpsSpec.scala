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

  test("hot key: buffers stay bucket-bounded and answers cross bucket gaps") {
    import spark.implicits._
    // key 1 is ~100× the median: 2000 right rows, one per hour, vs ~20
    // for key 2. With a 1-day bucket width no aggregation buffer may
    // hold more than 24 entries regardless of how hot the key is.
    val day = 24L * 3600 * 1000000L
    val hot = (0 until 2000).map(i => (1L, i.toLong * 3600, 1000L + i))
    val cold = (0 until 20).map(i => (2L, i.toLong * 86400, 2000L + i))
    val right = (hot ++ cold).toDF("k", "sec", "v")
      .withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
    val probes = Seq(
      (1L, 1999L * 3600 + 1800),  // mid-timeline, in-bucket hit
      (1L, 5000L * 3600),         // far past the end: bucket empty → carry
      (2L, 19L * 86400 + 1),      // cold key sanity
      (3L, 1000L),                // unknown key → null
      (1L, 0L)                    // exactly the first right row
    ).toDF("k", "sec").withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
    val out = TimeOps.asofJoin(probes, right, "k", "k", "t", "t",
      Seq("v"), bucketWidth = day)
    val m = out.select(col("k"), col("asof.v")).as[(Long, Option[Long])]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(m(1L) == Set(Some(2999L), Some(1000L)))
    assert(m(2L) == Set(Some(2019L)))
    assert(m(3L) == Set(None))
    // the packing invariant itself: no per-(key,bucket) array exceeds
    // the bucket occupancy bound (24 hourly rows/day here) even though
    // the hot key holds 2000 rows total
    val maxLen = right.select(col("k"),
        struct(unix_micros(col("t").cast("timestamp_ltz")).as("t"),
          col("v")).as("e"))
      .groupBy(col("k"), floor(col("e.t") / day).as("b"))
      .agg(count(lit(1)).as("n")).agg(max("n")).as[Long].head()
    assert(maxLen <= 24, s"bucket occupancy $maxLen exceeds the bound")
  }

  test("bucketed as-of equals a brute-force reference on seeded random data") {
    import spark.implicits._
    // seeded RNG: reproducible, adversarial shape — clustered times,
    // exact-boundary probes, many empty buckets, duplicate timestamps
    val rnd = new scala.util.Random(0xA50F)
    val hour = 3600L * 1000000L
    val right = Seq.fill(400) {
      val k = rnd.nextInt(5).toLong
      // cluster around a few epochs so some buckets are dense, most empty
      val t = rnd.nextInt(40) * 50000L + rnd.nextInt(3) * 5000000L
      (k, t, rnd.nextInt(100).toLong)
    }
    val probes = Seq.fill(300) {
      (rnd.nextInt(6).toLong, rnd.nextInt(2200000) * 100L)
    }
    val rightDf = right.toDF("k", "sec", "v")
      .withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
    val leftDf = probes.zipWithIndex.map { case ((k, s), i) => (i.toLong, k, s) }
      .toDF("pid", "k", "sec")
      .withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
    // tiny bucket width (1 hour of µs over second-scale data) forces
    // heavy bucket fragmentation and carry-path traffic
    val out = TimeOps.asofJoin(leftDf, rightDf, "k", "k", "t", "t",
      Seq("v"), bucketWidth = hour)
      .select(col("pid"), col("asof.v")).as[(Long, Option[Long])]
      .collect().toMap
    // brute force: latest (t, v) with t <= probe, ties -> max v
    val byKey = right.groupBy(_._1)
    probes.zipWithIndex.foreach { case ((k, s), i) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= s).sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(out(i.toLong) == want,
        s"probe $i key $k t $s: got ${out(i.toLong)}, want $want")
    }
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

  test("trained IVF recall >= 0.8 vs brute force at nprobe=2") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val q = e.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(e, q, 10))
    val ivf = pairs(Similarity.ivfTopK(e, q, 10))
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8 (nprobe=2)")
  }

  test("k-means training moves centroids off the seed and is deterministic") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // the uncached path twice: the memo would trivially return the same
    // object, which proves nothing about training determinism
    val seed = Similarity.trainCentroidsUncached(e, 16, 0)
    val t1 = Similarity.trainCentroidsUncached(e, 16, 3)
    val t2 = Similarity.trainCentroidsUncached(e, 16, 3)
    assert(t1.map(_._1) == seed.map(_._1))
    assert(t1.zip(t2).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    assert(t1.zip(seed).exists { case ((_, a), (_, b)) => !a.sameElements(b) })
    // and the memo returns the identical model for an equivalent plan...
    val c1 = Similarity.trainCentroids(e, 16, 3)
    val c2 = Similarity.trainCentroids(
      Tables.embeddings(spark, "/root/testdata/sf0.001"), 16, 3)
    assert(c1 eq c2)
    // ...but NOT for a same-schema corpus from a different directory
    // (canonicalized plans print without file locations — regression
    // guard for the cache key)
    val other = Similarity.trainCentroids(
      Tables.embeddings(spark, "/root/testdata/sf0.01"), 16, 3)
    assert(!(other eq c1))
    assert(other.zip(c1).exists { case ((_, a), (_, b)) => !a.sameElements(b) })
  }
}
