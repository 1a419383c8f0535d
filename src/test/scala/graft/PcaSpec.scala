package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA laws: the integer Gram stats match a naive recompute, the Jacobi
  * solve satisfies the eigen identities against its own covariance, the
  * projection obeys the Rayleigh variance law, and reconstruction error
  * shrinks monotonically with more components. */
class PcaSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.embeddings(spark, dir)

  private def micro(x: Float): Long =
    math.floor(x.toDouble * 1e6 + 0.5).toLong

  test("gram stats equal the naive driver recompute") {
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val got = Pca.gram(emb, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), BigInt(r.getDecimal(3).toBigInteger)))).toMap
    val d = rows.head.length
    for (i <- 0 until d; j <- i until d) {
      val want = rows.map(v => BigInt(micro(v(i))) * BigInt(micro(v(j)))).sum
      assert(got((i, j)) == ((rows.length.toLong, want)),
        s"gram mismatch at ($i,$j)")
    }
  }

  test("eigen identities: orthonormal axes, Cv = λv, descending spectrum") {
    val stats = Pca.collectStats(emb, "embedding")
    val model = Pca.fitFromStats(stats, 8)
    val d = stats.dim
    val nB = BigInt(stats.n)
    val denom = (nB * (nB - 1)).toDouble * 1e12
    val cov = Array.tabulate(d, d) { (i, j) =>
      (nB * stats.p(i)(j) - stats.s(i) * stats.s(j)).toDouble / denom
    }
    val v = model.components
    for (a <- v.indices; b <- v.indices) {
      val dot = v(a).zip(v(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"components $a,$b not orthonormal: $dot")
    }
    val lamScale = math.abs(model.eigenvalues.head) + 1e-12
    for (k <- v.indices) {
      val cvk = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(k)(j)).sum)
      val resid = cvk.zip(v(k)).map { case (cv, vk) =>
        math.abs(cv - model.eigenvalues(k) * vk) }.max
      assert(resid < 1e-8 * lamScale, s"eigen residual $resid at comp $k")
    }
    assert(model.eigenvalues.sliding(2)
      .forall(w => w.length < 2 || w(0) >= w(1) - 1e-12))
    assert(model.eigenvalues.sum <= model.totalVariance + 1e-12)
  }

  test("projection variance equals the spectrum (Rayleigh law)") {
    val model = Pca.fit(emb, "embedding", 8)
    val ss = Pca.project(emb, model, "embedding", "pca")
      .select(posexplode(col("pca")).as(Seq("comp", "v")))
      .groupBy("comp").agg(sum(col("v") * col("v")).as("ss"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (k <- model.eigenvalues.indices) {
      val varK = ss(k) / (model.n - 1.0)
      assert(math.abs(varK - model.eigenvalues(k)) < 1e-4 * model.totalVariance,
        s"comp $k: projected variance $varK vs eigenvalue ${model.eigenvalues(k)}")
    }
  }

  test("refit from state + delta is BIT-IDENTICAL to a from-scratch fit") {
    val dir = graft.sources.Scratch.dir("pca-stats-state")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    Pca.writeStatsState(base, "embedding", dir)
    val refit = Pca.fitRefreshed(spark, dir, delta, "embedding", 8)
    val scratch = Pca.fit(emb, "embedding", 8)
    // the statistics are exact integers, so covariance, Jacobi and the
    // resulting arrays are EXACTLY equal — not merely close
    assert(refit.n == scratch.n)
    assert(refit.mean.sameElements(scratch.mean))
    assert(refit.eigenvalues.sameElements(scratch.eigenvalues))
    assert(refit.components.length == scratch.components.length &&
      refit.components.zip(scratch.components)
        .forall { case (a, b) => a.sameElements(b) })
    assert(refit.totalVariance == scratch.totalVariance)
  }

  test("streaming stats twin: multi-batch fold + refit ≡ scratch; replay idempotent") {
    val root = graft.sources.Scratch.dir("pca-stats-stream")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    Pca.writeStatsState(base, "embedding", root)
    delta.repartition(3).write.mode("overwrite").parquet(s"$root/delta")
    val q = graft.streaming.StreamOps.maintainPcaStream(
      spark.readStream.schema(delta.schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root/delta"),
      "embedding", root, s"$root/ckpt")
    q.stop()
    def folded(): Map[(Int, Int), (Long, BigInt)] =
      Pca.readGramRefreshed(spark, root).collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(2), BigInt(r.getDecimal(3).toBigInteger)))).toMap
    val oneShot = Pca.gram(emb, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), BigInt(r.getDecimal(3).toBigInteger)))).toMap
    assert(folded() == oneShot, "streamed Gram fold != one-shot stats")
    // the full streamed REFIT (gram + moment partials) must equal a
    // from-scratch fit bit-for-bit — this is what the moment_batches
    // leg exists for (a Gram-only fold could not rebuild the mean)
    val refit = Pca.fitStreamRefreshed(spark, root, 8)
    val scratch = Pca.fit(emb, "embedding", 8)
    assert(refit.n == scratch.n &&
      refit.mean.sameElements(scratch.mean) &&
      refit.eigenvalues.sameElements(scratch.eigenvalues) &&
      refit.components.zip(scratch.components)
        .forall { case (a, b) => a.sameElements(b) },
      "streamed refit diverged from the from-scratch fit")
    // replay: rewrite partition 0 with its own content — stats frozen
    val p0Path = s"$root/gram_batches/ingest_batch=0"
    val p0 = spark.read.parquet(p0Path)
    val p0Rows = java.util.Arrays.asList(p0.collect(): _*)
    spark.createDataFrame(p0Rows, p0.schema)
      .write.mode("overwrite").parquet(p0Path)
    assert(folded() == oneShot, "replayed partition rewrite moved the stats")
  }

  test("torn partial-batch state (gram without moments) is refused") {
    // gram_batches and moment_batches are two non-atomic writes: a
    // crash between them leaves a micro-batch in one statistic only,
    // and a fit over mismatched n/S/P would be silently wrong. The
    // refit path must cross-check the two row counts and refuse.
    val root = graft.sources.Scratch.dir("pca-torn-state")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    Pca.writeStatsState(base, "embedding", root)
    // simulate the crash: gram partials landed, moment partials did not
    Pca.gram(delta, "embedding")
      .write.mode("overwrite").parquet(s"$root/gram_batches/ingest_batch=0")
    val e = intercept[IllegalArgumentException] {
      Pca.fitStreamRefreshed(spark, root, 8)
    }
    assert(e.getMessage.contains("disagree"),
      s"expected the torn-state refusal, got: ${e.getMessage}")
  }

  test("gram refuses elements whose square would overflow long") {
    import spark.implicits._
    val bad = Seq((1L, Array(0.5f, 4000.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] { Pca.gram(bad, "embedding").collect() }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(e).exists(_.contains("Pca.gram")),
      s"expected the in-plan overflow refusal, got: ${chain(e).mkString(" | ")}")
  }

  test("wrong-kind dir is refused by the stats-state readers") {
    val dir = graft.sources.Scratch.dir("pca-wrongkind")
    graft.operators.Maintain.writeQuantileState(
      graft.sources.Tables.orders(spark, "/root/testdata/sf0.001"),
      "o_orderstatus", "o_totalprice", dir, lo = 0.0, hi = 600000.0,
      bins = 8)
    val e = intercept[IllegalArgumentException] {
      Pca.mergeGramState(spark, dir, emb, "embedding")
    }
    assert(e.getMessage.contains("not PCA stats state"))
  }

  test("mean reconstruction error shrinks as components grow") {
    val rows = emb.select("embedding").limit(50).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val errs = Seq(2, 8, 16).map { r =>
      val model = Pca.fit(emb, "embedding", r)
      val err = rows.map { x =>
        val c = x.zip(model.mean).map { case (a, m) => a - m }
        val proj = model.components.map(w =>
          w.zip(c).map { case (wi, ci) => wi * ci }.sum)
        val rec = Array.tabulate(x.length)(i =>
          model.components.indices.map(k =>
            model.components(k)(i) * proj(k)).sum)
        c.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / rows.length
      err
    }
    assert(errs(0) >= errs(1) && errs(1) >= errs(2),
      s"reconstruction error not monotone: $errs")
    assert(errs(2) < errs(0), "more components did not help at all")
  }
}

/** RRF fusion laws: exact integer arithmetic, leg-order invariance, and
  * the rank-k cut honoring the (score desc, id asc) total order. */
class RetrievalRrfSpec extends AnyFunSuite with SparkSpec {
  import graft.operators.Retrieval

  private def leg(rows: Seq[(Long, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "rk")
  }

  test("fused scores are the exact integer RRF sums; order is total") {
    val a = leg(Seq((1L, 10L, 1), (1L, 11L, 2)))
    val b = leg(Seq((1L, 11L, 1), (1L, 12L, 2)))
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq.sortBy(_._4)
    val c1 = 1000000L / 61; val c2 = 1000000L / 62
    // doc 11 fuses rank2 + rank1; docs 10/12 carry one leg each
    assert(got == Seq(
      (1L, 11L, c1 + c2, 1),
      (1L, 10L, c1, 2),
      (1L, 12L, c2, 3)))
  }

  test("leg order does not change the fused board") {
    val a = leg(Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3)))
    val b = leg(Seq((7L, 3L, 1), (7L, 4L, 2)))
    val x = Retrieval.rrfFuse(Seq(a, b), 4).collect().toSet
    val y = Retrieval.rrfFuse(Seq(b, a), 4).collect().toSet
    assert(x == y)
  }
}
