package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, RefOps, Similarity, TextOps}

class RefOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("P5 gender normalization is idempotent and passes unknowns through") {
    val df = Seq("Male", "f", "M", "F", "Other", "x").toDF("g")
    val once = df.select(RefOps.normalizeGender(col("g")).as("g"))
    val twice = once.select(RefOps.normalizeGender(col("g")).as("g"))
    assert(once.as[String].collect().toSeq == Seq("M", "F", "M", "F", "Other", "x"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("P6 ISO truncation leaves T-less strings unchanged") {
    val df = Seq("1990-01-02T00:00:00", "1990-01-02", "", "abcT1T2").toDF("s")
    assert(df.select(RefOps.truncateIsoDate(col("s"))).as[String].collect().toSeq ==
      Seq("1990-01-02", "1990-01-02", "", "abc"))
  }

  test("joinPandas suffixes every collision, including the right key") {
    val l = Seq((1L, "a", 10L)).toDF("Id", "Name", "K")
    val r = Seq((10L, "b")).toDF("Id", "Name")
    val out = RefOps.joinPandas(l, r, "K", "Id")
    assert(out.columns.toSeq == Seq("Id_x", "Name_x", "K", "Id_y", "Name_y"))
    assert(out.select("Name_x", "Name_y").as[(String, String)].head() == ("a", "b"))
  }

  test("joinPandasOn dedups the key column like pandas on=") {
    val l = Seq((1L, "a")).toDF("Document", "Name")
    val r = Seq((1L, "b")).toDF("Document", "Name")
    val out = RefOps.joinPandasOn(l, r, "Document")
    assert(out.columns.toSeq == Seq("Document", "Name_x", "Name_y"))
  }
}

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  val near1 = "the quick brown fox jumps over the lazy dog again and again today"
  val near2 = "the quick brown fox jumps over the lazy dog again and again tomorrow"
  val other = "completely different content about spark catalyst optimizer internals"

  def corpus = Seq(
    (1L, near1), (2L, near2), (3L, other), (4L, near1), (5L, "tiny doc"))
    .toDF("doc_id", "text")

  test("exact duplicates by content hash") {
    val d = Dedup.exactDuplicates(corpus, "doc_id", "text").collect()
    assert(d.length == 1 && d(0).getAs[Long]("n_copies") == 2 &&
      d(0).getAs[Long]("keeper") == 1L)
  }

  test("normalized duplicates catch case/punctuation variants") {
    val df = Seq((1L, "Hello,  World!"), (2L, "hello world"), (3L, "bye"))
      .toDF("doc_id", "text")
    val d = Dedup.normalizedDuplicates(df, "doc_id", "text").collect()
    assert(d.length == 1 && d(0).getAs[Long]("n_copies") == 2)
  }

  test("paragraphDedup drops a planted boilerplate window from every doc") {
    // 4-token windows; the banner occupies window 0 of docs 1..3 exactly
    val banner = "copy right legal banner"
    val df = Seq(
      (1L, s"$banner alpha beta gamma delta"),
      (2L, s"$banner epsilon zeta eta theta"),
      (3L, s"$banner iota kappa lambda mu"),
      (4L, "nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text", chunkTokens = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("clean_text")))).toMap
    assert(out(1L) == ((2L, 1L, "alpha beta gamma delta")))
    assert(out(2L) == ((2L, 1L, "epsilon zeta eta theta")))
    assert(out(3L) == ((2L, 1L, "iota kappa lambda mu")))
    // untouched doc: nothing dropped, text reassembled verbatim
    assert(out(4L) == ((2L, 0L, "nu xi omicron pi rho sigma tau upsilon")))
  }

  test("paragraphDedup: duplicate-free corpus is the identity on token join") {
    val df = Seq((1L, "a b c d e"), (2L, "f g  h"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text", chunkTokens = 2)
      .collect()
    assert(out.length == 2) // the all-whitespace doc has no tokens
    val m = out.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_dropped"), r.getAs[String]("clean_text")))).toMap
    assert(m(1L) == ((0L, "a b c d e"))) // ragged tail window survives
    assert(m(2L) == ((0L, "f g h")))     // tokenization collapses runs
  }

  test("paragraphDedup: a window shared WITHIN one doc is also dropped") {
    val df = Seq((1L, "x y x y tail one"), (2L, "solo text here word"))
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("clean_text")))).toMap
    // "x y" occurs twice inside doc 1: both occurrences go
    assert(out(1L) == ((3L, 2L, "tail one")))
    assert(out(2L) == ((2L, 0L, "solo text here word")))
  }

  test("corpusOverlap: identical groups at 1.0, disjoint groups at 0.0") {
    val doc1 = "the quick brown fox jumps over the lazy dog every single day"
    val doc2 = "spark catalyst turns logical plans into physical plans with rules"
    val doc3 = "entirely different tokens describing storage engines and buffer pools"
    val df = Seq(
      (1L, "g1", doc1), (2L, "g1", doc2),
      (3L, "g2", doc1), (4L, "g2", doc2), // same shingle union as g1
      (5L, "g3", doc3))                   // disjoint from both
      .toDF("doc_id", "source", "text")
    val m = Dedup.corpusOverlap(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(m.size == 3)
    assert(m(("g1", "g2")) == 1.0)
    assert(m(("g1", "g3")) == 0.0 && m(("g2", "g3")) == 0.0)
  }

  test("corpusOverlap estimate tracks exact Jaccard on a planted overlap") {
    val shared = (1 to 30).map(i => s"shared$i").mkString(" ")
    val aOnly = (1 to 30).map(i => s"left$i").mkString(" ")
    val bOnly = (1 to 30).map(i => s"right$i").mkString(" ")
    val df = Seq(
      (1L, "a", s"$shared"), (2L, "a", aOnly),
      (3L, "b", s"$shared"), (4L, "b", bOnly))
      .toDF("doc_id", "source", "text")
    val est = Dedup.corpusOverlap(df, "source", "text", numHashes = 128)
      .collect().head.getAs[Double]("est_jaccard")
    // exact shingle-set Jaccard from the same shingle definition
    val hs = Dedup.shingleHashesFlat(df, "source", "text")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.flatMap(_.getSeq[Long](1)).toSet).toMap
    val exact = hs("a").intersect(hs("b")).size.toDouble /
      hs("a").union(hs("b")).size
    assert(math.abs(est - exact) < 0.15,
      s"est $est too far from exact $exact")
  }

  test("minhash LSH finds planted near-dup pair and the exact dup") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical docs always collide
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc
  }

  test("crossMinhashPairs: fixture semantics + mixed-parity law at sf0.001") {
    // bipartite fixture: incoming doc 2 (near-dup of corpus doc 1) is
    // flagged; incoming doc 5 (novel) is not; nothing self-joins
    val cross = Dedup.crossMinhashPairs(
      corpus.filter(col("doc_id").isin(2L, 5L)),
      corpus.filter(col("doc_id").isin(1L, 3L, 4L)),
      "doc_id", "text")
      .select("new_id", "matched_id").as[(Long, Long)].collect().toSet
    assert(cross.contains((2L, 1L)) && cross.contains((2L, 4L)))
    assert(!cross.exists(_._1 == 5L))
    // consistency law on real data: the bipartite result IS the
    // mixed-parity slice of the self-join result (same signatures, same
    // banding, same verify) — 11 such pairs at sf0.001, so non-vacuous
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val self = Dedup.minhashPairs(docs, "doc_id", "text")
      .filter(col("doc_a") % 2 =!= col("doc_b") % 2)
      .select(
        when(col("doc_a") % 2 === 1, col("doc_a")).otherwise(col("doc_b"))
          .as("new_id"),
        when(col("doc_a") % 2 === 1, col("doc_b")).otherwise(col("doc_a"))
          .as("matched_id"),
        col("jaccard"))
    val bipartite = Dedup.crossMinhashPairs(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    assert(self.count() > 0, "mixed-parity slice is empty — vacuous law")
    assert(bipartite.exceptAll(self).count() == 0 &&
      self.exceptAll(bipartite).count() == 0,
      "bipartite result diverges from the self-join's mixed-parity slice")
  }

  test("simhash hamming pairs: identical docs at distance 0") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text")
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    val exact = pairs.find(p => p._1 == 1L && p._2 == 4L)
    assert(exact.exists(_._3 == 0))
  }

  test("shingle hashes: distinct 3-gram count and md5 semantics") {
    val hs = Dedup.shingleHashesFlat(Seq((1L, "a b c d")).toDF("doc_id", "text"),
      "doc_id", "text").select("hs").as[Seq[Long]].head()
    assert(hs.length == 2) // "a b c", "b c d"
    // md5("a b c") = 0x..., first 8 hex chars as unsigned int
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c".getBytes("UTF-8"))
    val expect = ((md(0) & 255L) << 24) | ((md(1) & 255L) << 16) |
      ((md(2) & 255L) << 8) | (md(3) & 255L)
    assert(hs.contains(expect))
    // degenerate inputs
    val empty = Dedup.shingleHashesFlat(Seq((1L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text").select("hs").as[Seq[Long]].head()
    assert(empty.isEmpty)
  }
}

class EntityResSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import graft.operators.EntityRes

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("sorted neighborhood equals the brute-force definition") {
    // keys chosen so matches exist both within and across rank buckets
    val rows = Seq(
      (1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "betb"),
      (5L, "gamma"), (6L, "gamm"), (7L, "delta"), (8L, "zeta"),
      (9L, "zetb"), (10L, "omega"))
    val w = 3; val maxD = 1
    val got = EntityRes.sortedNeighborhoodPairs(
      rows.toDF("id", "name"), "id", "name", window = w, maxDist = maxD)
      .as[(Long, Long, Int)].collect().toSet
    // brute force: rank by (key, id), pair within w-1 positions, verify
    val ranked = rows.sortBy { case (id, k) => (k, id) }
    val want = (for {
      i <- ranked.indices; j <- (i + 1) until math.min(i + w, ranked.size)
      d = lev(ranked(i)._2, ranked(j)._2) if d <= maxD
    } yield (ranked(i)._1, ranked(j)._1, d)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("candidates respect the window: a far-sorting typo is missed") {
    // "zebra" vs "aebra": edit distance 1 but opposite ends of the sort
    val df = Seq((1L, "aebra"), (2L, "middle1"), (3L, "middle2"),
      (4L, "middle3"), (5L, "zebra")).toDF("id", "name")
    val got = EntityRes.sortedNeighborhoodPairs(df, "id", "name",
      window = 2, maxDist = 1).as[(Long, Long, Int)].collect()
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L),
      "window 2 must not see a pair 4 ranks apart")
  }

  test("ranks are exact across many partitions (no per-partition reset)") {
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, f"key$i%05d")).toDF("id", "name")
    // every adjacent pair differs in ≤ 2 trailing chars; with maxDist 2
    // and window 2 we expect EXACTLY the consecutive pairs whose keys
    // are within distance 2 — any rank discontinuity at a partition
    // boundary would drop or duplicate pairs there
    val got = EntityRes.sortedNeighborhoodPairs(df, "id", "name",
      window = 2, maxDist = 2).as[(Long, Long, Int)].collect()
    val want = (0 until n - 1).count(i =>
      lev(f"key$i%05d", f"key${i + 1}%05d") <= 2)
    assert(got.length == want, s"got ${got.length}, want $want")
    assert(got.forall(p => p._2 == p._1 + 1))
  }

  test("null keys fail loudly") {
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("id", "name")
    val e = intercept[IllegalArgumentException](
      EntityRes.sortedNeighborhoodPairs(df, "id", "name"))
    assert(e.getMessage.contains("null"))
  }

  test("multi-pass SN links first-char typos the forward pass misses") {
    // (1, 2) differ only in the FIRST character; three interposer keys
    // sort between them, so a window of 2 cannot see the pair forward.
    // Reversed, both end in "pie" and become adjacent.
    val df = Seq((1L, "apple pie"), (2L, "bpple pie"), (3L, "aqua gel"),
      (4L, "arrow tip"), (5L, "auburn hue"), (6L, "kiwi tart"))
      .toDF("id", "name")
    val single = EntityRes.sortedNeighborhoodPairs(df, "id", "name",
      window = 2, maxDist = 1).as[(Long, Long, Int)].collect().toSet
    assert(!single.exists(p => Set(p._1, p._2) == Set(1L, 2L)),
      "forward pass alone must miss the far-sorting pair")
    val multi = EntityRes.sortedNeighborhoodMultiPass(df, "id", "name",
      window = 2, maxDist = 1).as[(Long, Long, Int)].collect().toSet
    assert(multi.contains((1L, 2L, 1)),
      s"reversed pass must recover the first-char typo, got $multi")
    // multipass contains the canonicalized forward pairs
    val canonSingle = single.map(p =>
      (math.min(p._1, p._2), math.max(p._1, p._2), p._3))
    assert(canonSingle.subsetOf(multi))
  }
}

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(-1f, 0f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with id tie-break") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), 2)
      .select("vec_id", "rk").as[(Long, Int)].collect().toMap
    assert(out(1L) == 1) // closest
    assert(out(2L) == 2) // orthogonal ranks above antipodal
  }

  test("cosine matches manual computation") {
    val sim = vecs.filter(col("vec_id") === 0).select(col("embedding").as("a"))
      .crossJoin(vecs.filter(col("vec_id") === 1).select(col("embedding").as("b")))
      .select(Similarity.cosine("a", "b")).as[Double].head()
    val expect = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(sim - expect) < 1e-9)
  }

  test("identical vectors share an LSH bucket; antipodal vectors do not") {
    val b = Similarity.withBucket(
      Seq((0L, Array(1f, 2f, 3f, 4f)), (1L, Array(1f, 2f, 3f, 4f)),
        (2L, Array(-1f, -2f, -3f, -4f))).toDF("vec_id", "embedding"), 8)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L))
  }

  test("training fails loudly on a corpus without seed ids") {
    val e = intercept[IllegalArgumentException] {
      Similarity.trainCentroidsUncached(vecs.filter(col("vec_id") >= 100), 4, 1)
    }
    assert(e.getMessage.contains("seed"))
  }

  test("centroid cache retrains when the corpus path is overwritten") {
    val dir = graft.sources.Scratch.dir("ivf-cache")
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    e.filter(col("vec_id") < 40).write.mode("overwrite").parquet(dir)
    val c1 = Similarity.trainCentroids(spark.read.parquet(dir), 8, 1)
    // overwrite the SAME path with different vectors (ids re-based so the
    // 8 seed ids still exist) and re-read: the memo key includes the
    // scan's file listing, so this must retrain — a stale quantizer here
    // is the silent-recall-collapse failure mode
    e.filter(col("vec_id") >= 40 && col("vec_id") < 80)
      .withColumn("vec_id", col("vec_id") - 40)
      .write.mode("overwrite").parquet(dir)
    val c2 = Similarity.trainCentroids(spark.read.parquet(dir), 8, 1)
    assert(c1.zip(c2).exists { case ((_, a), (_, b)) => !a.sameElements(b) },
      "overwritten corpus returned a stale memoized quantizer")
    // the explicit escape hatch empties the memo outright
    Similarity.invalidateCentroidCache()
    val c3 = Similarity.trainCentroids(spark.read.parquet(dir), 8, 1)
    assert(c2.zip(c3).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }
}

class TextOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("linearModelLogit matches a JVM replay of the md5 weight table") {
    import graft.operators.TextOps
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def weight(f: String): Long =
      h60("qw:" + (h60("qb:" + f) % TextOps.QualityModelDim).toString) % 2001 - 1000
    val texts = Seq((1L, "the quick brown fox"), (2L, "solo"),
      (3L, "spark spark spark"))
    val got = texts.toDF("doc_id", "text")
      .withColumn("t", TextOps.tokens(col("text")))
      .withColumn("f", TextOps.hashedFeatures(col("t")))
      .select(col("doc_id"), size(col("f")).cast("long").as("n"),
        TextOps.linearModelLogit(col("f")).as("logit"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for ((id, text) <- texts) {
      val toks = text.split("\\s+").toSeq
      val feats =
        if (toks.size >= 2) toks ++ toks.sliding(2).map(_.mkString(" "))
        else toks
      assert(got(id) == ((feats.size.toLong, feats.map(weight).sum)),
        s"doc $id logit mismatch")
    }
  }

  test("linearModelLogit plan is scan-only: no exchange, no UDF") {
    import graft.operators.TextOps
    val df = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("t", TextOps.tokens(col("text")))
      .filter(size(col("t")) > 0)
      .withColumn("f", TextOps.hashedFeatures(col("t")))
      .select(col("doc_id"), TextOps.linearModelLogit(col("f")).as("logit"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"inference pass must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"inference pass must not leave codegen:\n$plan")
    assert(df.count() > 0)
  }

  test("repetition stats: top-bigram run count and duplicate-token fraction") {
    // "a b a b a b c": bigrams = [a b, b a, a b, b a, a b, b c] →
    // top "a b" ×3 of 6; tokens 7 with 3 distinct → dup frac 1 − 3/7
    val df = Seq((1L, "a b a b a b c"), (2L, "x y z")).toDF("doc_id", "text")
      .withColumn("t", graft.operators.TextOps.tokens(col("text")))
      .withColumn("b", graft.operators.TextOps.bigrams(col("t")))
      .select(col("doc_id"),
        graft.operators.TextOps.maxElementCount(col("b")).as("n"),
        round(lit(1.0) - size(array_distinct(col("t")))
          / size(col("t")).cast("double"), 6).as("dup"))
    val out = df.as[(Long, Long, Double)].collect()
      .map { case (k, n, d) => k -> ((n, d)) }.toMap
    assert(out(1L) == ((3L, math.rint((1.0 - 3.0 / 7) * 1e6) / 1e6)))
    assert(out(2L) == ((1L, 0.0))) // all-unique doc: every bigram once
    // empty array → 0, not null
    val empty = Seq(Tuple1(Array.empty[String])).toDF("b")
      .select(graft.operators.TextOps.maxElementCount(col("b"))).as[Long].head()
    assert(empty == 0L)
  }

  test("keyTerms: hand-computed (tf desc, df asc, term) ranking, bounded agg") {
    // corpus: doc 1 "b b b a c", doc 2 "a a b", doc 3 "c"
    //   df: a→2, b→2, c→2
    //   doc 1: b(tf3) > a(tf1,df2) vs c(tf1,df2) tie → term asc: a, c
    //   doc 2: a(tf2) > b(tf1)
    //   doc 3: c only
    val docs = Seq((1L, "b b b a c"), (2L, "a a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.keyTerms(docs, k = 2)
    val got = out.as[(Long, Int, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, "b", 3L, 2L), (1L, 2, "a", 1L, 2L),
      (2L, 1, "a", 2L, 2L), (2L, 2, "b", 1L, 2L),
      (3L, 1, "c", 1L, 2L)),
      s"keyword ranking diverged: $got")
    // rarity beats ties: a term appearing in FEWER documents outranks
    // an equally-frequent common one
    val docs2 = Seq((1L, "x q"), (2L, "x")).toDF("doc_id", "text")
    val r2 = graft.operators.TextOps.keyTerms(docs2, k = 1)
      .as[(Long, Int, String, Long, Long)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(r2(1L) == "q", "df=1 'q' must outrank df=2 'x' at equal tf")
    // the per-doc reduction runs through the bounded typed aggregator
    // with PARTIAL aggregation — k terms per doc per partition cross
    // the shuffle, no window sorts the scored term table
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial"),
      "keyTerms must reduce via the partial bounded aggregator")
    assert(!plan.contains("Window"), "keyTerms must not plan a window sort")
    // non-numeric ids fail loudly instead of collapsing every row into
    // one doc_id=null group of corpus-level garbage terms
    val uuidDocs = Seq(("a-1", "x y"), ("b-2", "y z")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.TextOps.keyTerms(uuidDocs)
    }
    assert(ex.getMessage.contains("null/non-numeric"))
  }

  test("invertedIndex: sorted postings, df-capped terms stay as accounting rows") {
    // 'a' in 3 docs (over cap 2 → NULL postings), 'b' in docs 1,3, 'c' in doc 2
    val docs = Seq((3L, "a b"), (1L, "a b b"), (2L, "a c"))
      .toDF("doc_id", "text")
    val out = TextOps.invertedIndex(docs, dfCap = 2)
      .as[(String, Long, Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out == Map(
      "a" -> ((3L, None)), // over cap: df kept, postings not paid for
      "b" -> ((2L, Some("1,3"))), // numeric order, repeated tokens deduped
      "c" -> ((1L, Some("2")))))
  }

  test("bm25TopK: plain-Scala replay of the rational-idf formula, " +
    "tie-break + bounded partial agg") {
    // corpus: doc 1 "a b c", doc 2 "a a d", doc 3 "e f"; query "a d z"
    // (z is OOV — must not score); N=3, S=8
    val corpus = Seq((1L, "a b c"), (2L, "a a d"), (3L, "e f"))
      .toDF("doc_id", "text")
    val queries = Seq((100L, "a d z")).toDF("query_id", "query_text")
    val out = TextOps.bm25TopK(corpus, queries, k = 5)
    val got = out.orderBy("query_id", "rk")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // independent replay of the documented integer formula
    val (n, s) = (3L, 8L)
    def idf(df: Long) = (1000000L * (2 * (n - df) + 1)) / (2 * df + 1)
    def sat(tf: Long, dl: Long) =
      (1000000L * tf * 22 * s) / (10 * s * tf + 3 * s + 9 * dl * n)
    val d1 = idf(2) * sat(1, 3) / 1000000L // 'a' in doc 1
    val d2 = idf(2) * sat(2, 3) / 1000000L + // 'a' in doc 2
      idf(1) * sat(1, 3) / 1000000L // 'd' in doc 2
    assert(got == Seq((100L, 1, 2L, d2), (100L, 2, 1L, d1)),
      s"bm25 scores diverged from the formula replay: $got")
    assert(d2 > d1, "the doc matching the rarer term must rank first")
    // equal-score tie breaks on doc_id asc: identical twin docs
    val twins = Seq((7L, "x y"), (5L, "x y")).toDF("doc_id", "text")
    val q2 = Seq((1L, "x")).toDF("query_id", "query_text")
    val tied = TextOps.bm25TopK(twins, q2, k = 2)
      .orderBy("rk").as[(Long, Int, Long, Long)].collect().toSeq
    assert(tied.map(t => (t._2, t._3)) == Seq((1, 5L), (2, 7L)))
    assert(tied(0)._4 == tied(1)._4, "twin docs must score identically")
    // the per-query reduction is the bounded typed aggregator with
    // PARTIAL aggregation — k rows per query per map partition cross
    // the final shuffle, no window sorts the scored (query × doc) table
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial"),
      "bm25TopK must reduce via the partial bounded aggregator")
    assert(!plan.contains("Window"), "bm25TopK must not plan a window sort")
    val empty = intercept[IllegalArgumentException] {
      TextOps.bm25TopK(Seq((1L, " ")).toDF("doc_id", "text"), q2)
    }
    assert(empty.getMessage.contains("no tokenized documents"))
  }

  test("bm25TopK maxDfFrac: pruning a common term == querying without it") {
    // 'a' is in 3 of 4 docs (df frac 0.75); maxDfFrac = 0.5 must drop it
    // from SCORING only — corpus stats (N, S, df of kept terms) are
    // untouched, so the result equals the un-pruned run of the query
    // with 'a' removed
    val corpus = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"), (4L, "e f"))
      .toDF("doc_id", "text")
    val pruned = TextOps.bm25TopK(corpus,
        Seq((1L, "a b")).toDF("query_id", "query_text"), k = 4,
        maxDfFrac = 0.5)
      .orderBy("rk").as[(Long, Int, Long, Long)].collect().toSeq
    val withoutTerm = TextOps.bm25TopK(corpus,
        Seq((1L, "b")).toDF("query_id", "query_text"), k = 4)
      .orderBy("rk").as[(Long, Int, Long, Long)].collect().toSeq
    assert(pruned == withoutTerm && pruned.map(_._3) == Seq(1L),
      s"pruned=$pruned withoutTerm=$withoutTerm")
    val bad = intercept[IllegalArgumentException] {
      TextOps.bm25TopK(corpus,
        Seq((1L, "b")).toDF("query_id", "query_text"), maxDfFrac = 0.0)
    }
    assert(bad.getMessage.contains("maxDfFrac"))
  }

  test("bigram familiarity: hand-computed conditional frequencies") {
    // corpus: "a b", "a b", "a c", "z" →
    //   bigram counts: c("a b")=2, c("a c")=1; prefix c("a ·")=3
    //   (UNfloored — prefix totals stay true conditionals)
    //   docs 1,2: one "a b" occurrence → floor(1e6·2/3)/1e6 = 0.666666
    //   doc 3: one "a c" occurrence, but c("a c")=1 is under the default
    //     floor (DefaultFamiliarityMinCount=2) → unscored, contributes
    //     0; the occurrence still counts in the denominator
    //   doc 4: single token, no bigrams → absent
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.bigramFamiliarity(docs)
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, f) => k -> ((n, f)) }.toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((1L, 0.666666)))
    assert(out(2L) == ((1L, 0.666666)))
    assert(out(3L) == ((1L, 0.0)))
    // minCount = 1 disables the floor: doc 3 scores its hapax bigram
    // floor(1e6·1/3)/1e6 = 0.333333 — the pre-floor semantics
    val unfloored = graft.operators.TextOps
      .bigramFamiliarity(docs, minCount = 1)
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, f) => k -> ((n, f)) }.toMap
    assert(unfloored(3L) == ((1L, 0.333333)))
    assert(unfloored(1L) == ((1L, 0.666666)))
    // a doc with repeated bigrams: "a b a b" has bigrams [a b, b a, a b]
    // → k("a b")=2, k("b a")=1; corpus here: c("a b")=2 (kept), c("b a")=1
    // (under the floor → 0), prefix a=2, b=1 → contributions
    // 2·floor(1e6·2/2) + 1·0 = 2e6 over n=3 → round(2/3, 6) = 0.666667
    val solo = graft.operators.TextOps
      .bigramFamiliarity(Seq((9L, "a b a b")).toDF("doc_id", "text"))
      .as[(Long, Long, Double)].head()
    assert(solo == ((9L, 3L, 0.666667)))
  }

  test("lmScore: hand-computed smoothed conditionals, OOV penalized not skipped") {
    // train: "a b", "a b", "a c" → unigrams c1(a)=3, c1(b)=2, c1(c)=1,
    // V=3; bigrams c2("a b")=2, c2("a c")=1
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    // target doc 10: "a b" — seen pair: floor(1e6·(2+1)/(3+3)) = 500000
    // target doc 11: "a z" — unseen pair, seen prefix:
    //   floor(1e6·(0+1)/(3+3)) = 166666, oov_pairs = 1
    // target doc 12: "q r" — unseen pair, UNSEEN prefix:
    //   floor(1e6·1/(0+3)) = 333333, oov_pairs = 1
    // target doc 13: "z" — single token → absent
    val target = Seq((10L, "a b"), (11L, "a z"), (12L, "q r"), (13L, "z"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.lmScore(train, target)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (k, n, o, s) => k -> ((n, o, s)) }.toMap
    assert(out.keySet == Set(10L, 11L, 12L))
    assert(out(10L) == ((1L, 0L, 0.5)))
    assert(out(11L) == ((1L, 1L, 0.166666)))
    assert(out(12L) == ((1L, 1L, 0.333333)))
    // familiarity-style self-scoring would give doc 11 and 12 identical
    // zero contributions; the smoothed LM separates "novel continuation
    // of a known word" from "fully out-of-domain" — that ordering (12's
    // uniform-over-V beats 11's dilution by a(3)'s count) is the add-one
    // law, asserted above, not an accident
    val empty = intercept[IllegalArgumentException] {
      graft.operators.TextOps.lmScore(
        Seq((1L, "")).toDF("doc_id", "text"), target)
    }
    assert(empty.getMessage.contains("no tokens"))
  }

  test("language ID picks marker-majority language, 'und' fallback") {
    val df = Seq(
      (1L, "der hund und die katze ist da"),
      (2L, "the cat and the dog is a pet"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextOps.langId(TextOps.tokens(col("text"))).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "de" && out(2L) == "en" && out(3L) == "und")
  }

  test("fingerprint collapses word order and duplication") {
    val df = Seq((1L, "b a a c"), (2L, "c b a"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = df.select(TextOps.fingerprint(TextOps.tokens(col("text"))).as("fp"))
      .as[String].collect()
    assert(fps(0) == fps(1) && fps(0) == "a b c" && fps(2) == "a b d")
  }

  test("quality score: stopword-heavy text scores lower") {
    val toks = TextOps.tokens(col("text"))
    val df = Seq((1L, "the a of and is the a of"), (2L, "informative unique content words here"))
      .toDF("doc_id", "text")
    val scores = df.select(col("doc_id"), TextOps.qualityScore(toks).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) < scores(2L))
  }

  test("packOffsets: two-phase prefix sum == single-window cumsum, any bucketSize") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // the reference form the operator refuses at scale: one global-order
    // window — fine on 500 rows, and exact integer math means the
    // bucketed form must match it BIT for bit, for every bucketing
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("start div 128L").as("seq_idx"), (col("start") % 128).as("seq_off"))
      .as[(Long, Long, Long, Long)].collect().toSet
    // bucketSize 1 (every doc its own bucket), tiny, large, non-divisor,
    // and 0 (auto-derived from the id span) must all agree with the
    // reference
    for (bs <- Seq(0L, 1L, 7L, 64L, 100000L)) {
      val got = TextOps.packOffsets(docs, "doc_id", "text", 128, bs)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"bucketSize=$bs diverged from single-window form")
    }
    // conservation: the last document ends exactly at the total token count
    val total = expected.toSeq.map(_._2).sum
    val last = expected.maxBy(_._1)
    assert(last._3 * 128 + last._4 + last._2 == total,
      "offsets do not concatenate to the total token count")
  }

  test("packOffsets fails loudly on a null doc id") {
    // ANSI mode already makes a malformed string id die loudly at the
    // cast; a genuinely NULL id sails through it and — without the
    // contract check — surfaced as an opaque NPE deep in the
    // bucket-total pull
    val bad = Seq(Some(1L), None).zip(Seq("x y z", "w"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.packOffsets(bad, "doc_id", "text", 128)
    }
    assert(e.getMessage.contains("null/non-numeric"))
  }

  test("packOffsets on an empty corpus returns an empty result, not an NPE") {
    // regression: the null-id contract check used sum(when(...)), which
    // is NULL over zero rows — getLong(0) then threw exactly the opaque
    // NPE the check was added to prevent
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.packOffsets(empty, "doc_id", "text", 128).count() == 0)
  }
}
