package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Laws for the shared two-phase prefix sum and the PPS sampler built on
  * it: bucketing-invariance against the single-window oracle, exact
  * interval semantics of the md5-point draw, proportionality on a
  * planted heavy document, loud failure on null ids, and the
  * broadcast-points plan shape (the corpus is scanned, never shuffled,
  * by the draw itself). */
class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def weighted = {
    val r = new scala.util.Random(7)
    (0L until 300L).map(i => (i * 3 + 11, // gappy, unordered-ish ids
      if (i % 17 == 0) 0L else r.nextInt(50).toLong + 1L))
      .toDF("id", "w")
  }

  test("exclusiveOffsets == single-window cumsum for any bucketSize") {
    val df = weighted
    val oracle = df
      .withColumn("start", coalesce(
        sum("w").over(org.apache.spark.sql.expressions.Window
          .orderBy("id").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select("id", "w", "start")
      .as[(Long, Long, Long)].collect().toSet
    for (bs <- Seq(0L, 1L, 7L, 64L, 100000L)) {
      val got = Sampling.exclusiveOffsets(df, "id", "w", bs)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == oracle, s"bucketSize=$bs drifted from the window oracle")
    }
  }

  test("every draw lands in its document's interval; m rows; zero-weight rows never drawn") {
    val df = weighted
    val offs = Sampling.exclusiveOffsets(df, "id", "w")
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, s) => id -> (s, w) }.toMap
    val total = offs.values.map(_._2).sum
    val got = Sampling.weightedSample(df, "id", "w", 32)
      .as[(Int, Long, Long)].collect()
    assert(got.length == 32)
    assert(got.map(_._1).toSet == (0 until 32).toSet)
    got.foreach { case (_, id, w) =>
      assert(w > 0L, s"zero-weight doc $id was drawn")
      assert(offs(id)._2 == w)
    }
    assert(total > 0)
    // determinism: a second invocation is bit-identical
    val again = Sampling.weightedSample(df, "id", "w", 32)
      .as[(Int, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("a planted heavy document absorbs the bulk of the points") {
    val df = ((1L to 50L).map(i => (i, 1L)) :+ (999L, 10000L))
      .toDF("id", "w")
    val draws = Sampling.weightedSample(df, "id", "w", 64)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    // heavy doc owns 10000/10050 of the weight line; with 64 md5 points
    // anything under a majority would mean the interval mapping is wrong
    assert(draws.getOrElse(999L, 0L) > 32L,
      s"heavy doc drew only ${draws.getOrElse(999L, 0L)}/64: $draws")
  }

  test("null id fails loudly, empty input yields an empty sample base") {
    val bad = Seq((Some(1L), 5L), (None, 3L)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.exclusiveOffsets(bad, "id", "w").count()
    }
    assert(e.getMessage.contains("null/non-numeric"))
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(Sampling.exclusiveOffsets(empty, "id", "w").count() == 0L)
  }

  test("temperatureMix: sqrt rebalance replays exactly and lands on budget") {
    // domains 900 / 90 / 10 docs; T=2 shares ∝ 30 : ~9.49 : ~3.16
    val df = ((0 until 900).map(i => (i.toLong, "big")) ++
      (0 until 90).map(i => (1000L + i, "mid")) ++
      (0 until 10).map(i => (2000L + i, "tiny")))
      .toDF("doc_id", "source")
    val m = 500L
    val got = Sampling.temperatureMix(df, "doc_id", "source", m)
      .as[(Long, String, Long)].collect()
    assert(got.length == 1000)
    // JVM replay of the exact formulas (same sqrt, same order, same md5)
    val nd = Map("big" -> 900L, "mid" -> 90L, "tiny" -> 10L)
    val wsum = nd.values.map(n => math.sqrt(n.toDouble)).sum
    def rate(d: String) = m.toDouble * math.sqrt(nd(d).toDouble) / wsum / nd(d)
    def h60(s: String): Long = {
      val x = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(x, 16)
    }
    got.foreach { case (id, d, c) =>
      val r = rate(d)
      val thr = math.floor((r - math.floor(r)) * 1152921504606846976.0).toLong
      val want = math.floor(r).toLong + (if (h60(s"tmix:$id") < thr) 1L else 0L)
      assert(c == want, s"doc $id ($d): copies $c != $want")
    }
    // budget concentration: within 5% of m
    val total = got.map(_._3).sum
    assert(math.abs(total - m) <= m / 20, s"total $total vs budget $m")
    // rebalance direction: per-doc rate strictly increases as the
    // domain shrinks (rare domains gain epochs, common ones thin)
    assert(rate("tiny") > rate("mid") && rate("mid") > rate("big"))
    // the tiny domain must actually oversample past one epoch here
    assert(rate("tiny") > 1.0)
    assert(got.filter(_._2 == "tiny").map(_._3).sum >= 10L)
  }

  test("the draw broadcasts the points — the corpus side is never shuffled by the join") {
    val plan = Sampling.weightedSample(weighted, "id", "w", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast range join of the m points:\n$plan")
  }
}

/** Cluster-balanced diversity sampling laws: per-cell budgets are hard
  * caps, and the √ allocation FLATTENS — a dominant cluster's share of
  * the sample must fall below its share of the corpus. */
class DiversitySampleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // skewed synthetic corpus in two well-separated directions: cell of
  // seed 0 gets 360 vectors, cell of seed 1 gets 40 (dim 64, unit-ish)
  private def skewed: org.apache.spark.sql.DataFrame = {
    def vec(hot: Int, eps: Float): Seq[Float] =
      (0 until 64).map(d => (if (d == hot) 1.0f else 0.0f) +
        (if (d == 63) eps else 0.0f)).toSeq
    val rows = (0L until 360L).map(i => (i, vec(0, (i % 7).toFloat * 1e-3f))) ++
      (360L until 400L).map(i => (i, vec(1, (i % 5).toFloat * 1e-3f)))
    // seeds: vec_id 0 → direction 0, vec_id 1 must be direction 1 for a
    // 2-centroid quantizer to see both clusters — swap id 1 and 360
    rows.map {
      case (1L, _) => (1L, vec(1, 0f))
      case (360L, _) => (360L, vec(0, 1e-3f))
      case r => r
    }.toDF("vec_id", "embedding")
  }

  test("per-cell counts never exceed the sqrt budget; head cluster is flattened") {
    val out = graft.operators.Similarity
      .clusterBalancedSample(skewed, budget = 40, nCentroids = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val perCell = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // replay the budget rule
    val sizes = Map(0 -> 360L, 1 -> 40L) // by construction (seeds fixed)
    val st = sizes.values.map(n => math.sqrt(n.toDouble)).sum
    sizes.foreach { case (c, n) =>
      val b = math.floor(40 * math.sqrt(n.toDouble) / st).toLong
      assert(perCell.getOrElse(c, 0L) <= b, s"cell $c exceeded budget $b")
    }
    // flattening: head cell holds 90% of the corpus but must take a
    // strictly smaller share of the sample (√360 : √40 ≈ 3 : 1)
    val headShare = perCell(0).toDouble / out.length
    assert(headShare < 0.9, s"head cluster not flattened: $headShare")
    assert(perCell(1) > 0, "tail cluster starved")
    // ranks are 1..count within each cell (bounded top-k, no gaps)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("seededShuffle: a dense deterministic permutation — " +
      "partitioning-invariant, seed-sensitive, and actually shuffled") {
    import spark.implicits._
    val docs = (1L to 400L).toDF("doc_id")
    def run(df: org.apache.spark.sql.DataFrame, seed: Long) =
      graft.operators.Sampling.seededShuffle(df, "doc_id", seed, 4)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(docs, 7L)
    // every doc assigned exactly once; within each shard pos is dense 1..n
    assert(a.map(_._1) == (1L to 400L))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // pure function of (seed, id): any input partitioning gives the
    // same assignment (rand()-based shuffles fail exactly this)
    assert(run(docs.repartition(13), 7L) == a)
    // a different seed re-deals the permutation
    assert(run(docs, 8L) != a)
    // actually shuffled: consecutive source ids must not ride together
    // in shard-order (crawl-order runs are what the op breaks up)
    val orderInShard0 = a.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(orderInShard0 != orderInShard0.sorted,
      "shard 0 preserved source order — not a shuffle")
  }

  private def mixCorpus = {
    val r = new scala.util.Random(11)
    (0L until 360L).map { i =>
      val dom = if (i % 6 == 0) "b" else if (i % 90 == 3) "c" else "a"
      val tok = if (i % 40 == 7) 0L else r.nextInt(20).toLong + 1L
      (i * 2 + 5, dom, tok)
    }.toDF("id", "dom", "tok")
  }

  test("tokenBudgetMix: two-phase prefix == single-window oracle for " +
      "any input partitioning; copy counts replay the div/mod formula") {
    val docs = mixCorpus
    val budgets = Seq(("a", 900L), ("b", 10000L), ("c", 0L))
      .toDF("dom", "budget")
    val oracle = {
      val h = graft.operators.Dedup.md5Hash60(
        concat(lit("tbmix:"), col("id").cast("string")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("dom").orderBy("__h", "id")
        .rowsBetween(Long.MinValue, -1)
      docs.withColumn("__h", h)
        .withColumn("tok_start", coalesce(sum("tok").over(w), lit(0L)))
        .select("id", "dom", "tok", "tok_start")
        .as[(Long, String, Long, Long)].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
    }
    val totals = docs.groupBy("dom").agg(sum("tok")).as[(String, Long)]
      .collect().toMap
    val bud = Map("a" -> 900L, "b" -> 10000L, "c" -> 0L)
    for (parts <- Seq(1, 13)) {
      val got = Sampling
        .tokenBudgetMix(docs.repartition(parts), "id", "dom", "tok", budgets)
        .as[(Long, String, Long, Long, Long)].collect()
      assert(got.length == 360, "every input document comes back")
      got.foreach { case (id, dom, tok, start, n) =>
        assert(start == oracle((id, dom, tok)),
          s"prefix sum drifted for id=$id at parts=$parts")
        val (s, b) = (totals(dom), bud(dom))
        val expect = b / s + (if (start < b % s) 1L else 0L)
        assert(n == expect, s"copy count drifted for id=$id")
      }
    }
  }

  test("tokenBudgetMix: delivered tokens land within one document of " +
      "each budget; regimes (fill / multi-epoch / zero / absent) hold") {
    val docs = mixCorpus
    val budgets = Seq(("a", 900L), ("b", 1500L)).toDF("dom", "budget")
    val got = Sampling.tokenBudgetMix(docs, "id", "dom", "tok", budgets)
      .as[(Long, String, Long, Long, Long)].collect()
    val totals = docs.groupBy("dom").agg(sum("tok")).as[(String, Long)]
      .collect().toMap
    val bud = Map("a" -> 900L, "b" -> 1500L, "c" -> 0L)
    for (dom <- Seq("a", "b", "c")) {
      val rows = got.filter(_._2 == dom)
      val delivered = rows.map(r => r._3 * r._5).sum
      val maxTok = rows.map(_._3).max
      val b = bud(dom)
      if (b % totals(dom) == 0L) assert(delivered == b)
      else assert(delivered >= b && delivered < b + maxTok,
        s"$dom delivered $delivered for budget $b (maxTok $maxTok)")
    }
    // fill regime: a's budget is sub-epoch → copies ∈ {0, 1}, both seen
    val aCopies = got.filter(_._2 == "a").map(_._5).toSet
    assert(aCopies == Set(0L, 1L))
    // multi-epoch regime: b's budget exceeds its mass → every doc ≥ base
    val bBase = 1500L / totals("b")
    assert(bBase >= 1L && got.filter(_._2 == "b").forall(_._5 >= bBase))
    // absent domain: c is not in the budget table → 0 copies everywhere
    assert(got.filter(_._2 == "c").forall(_._5 == 0L))
  }

  test("tokenBudgetMix: loud failures — null domain, negative tokens, " +
      "duplicated budget domain") {
    val budgets = Seq(("a", 10L)).toDF("dom", "budget")
    val nullDom = Seq((1L, "a", 3L), (2L, null: String, 4L))
      .toDF("id", "dom", "tok")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetMix(nullDom, "id", "dom", "tok", budgets).collect()
    }
    assert(e1.getMessage.contains("null"))
    val negTok = Seq((1L, "a", 3L), (2L, "a", -4L)).toDF("id", "dom", "tok")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetMix(negTok, "id", "dom", "tok", budgets).collect()
    }
    assert(e2.getMessage.contains("negative"))
    val ok = Seq((1L, "a", 3L)).toDF("id", "dom", "tok")
    val dup = Seq(("a", 10L), ("a", 20L)).toDF("dom", "budget")
    val e3 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetMix(ok, "id", "dom", "tok", dup).collect()
    }
    assert(e3.getMessage.contains("repeats a domain"))
    // duplicate document ids tie on the md5 draw — their fill order
    // (hence tok_start / n_copies when token counts differ) would be
    // partitioning-dependent; the op refuses rather than losing its
    // reproducibility contract (advisor r18)
    val dupId = Seq((1L, "a", 3L), (1L, "a", 7L)).toDF("id", "dom", "tok")
    val e4 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetMix(dupId, "id", "dom", "tok", budgets).collect()
    }
    assert(e4.getMessage.contains("duplicate") &&
      e4.getMessage.contains("distinct ids"))
  }

  test("temperatureTokenBudgets: √-mixture formula replays exactly; " +
      "rare domains gain share, common domains lose it") {
    val docs = mixCorpus
    val total = 5000L
    val got = Sampling.temperatureTokenBudgets(docs, "dom", "tok", total)
      .as[(String, Long)].collect().toMap
    val masses = docs.groupBy("dom").agg(sum("tok")).as[(String, Long)]
      .collect().toMap
    val wsum = masses.values.toSeq.map(s => math.sqrt(s.toDouble)).sum
    for ((dom, s) <- masses) {
      val expect = math.floor(
        total.toDouble * math.sqrt(s.toDouble) / wsum).toLong
      assert(got(dom) == expect, s"budget formula drifted for $dom")
    }
    // rebalance direction: epochs = budget / mass grows as mass shrinks
    val epochs = masses.map { case (d, s) => d -> got(d).toDouble / s }
    assert(epochs("c") > epochs("b") && epochs("b") > epochs("a"),
      s"√-mixture must favor rare domains, got $epochs")
    // negative token mass fails loudly naming the DATA column, before
    // sqrt can turn it into NaN budgets or a misleading budgets-table
    // refusal downstream
    val bad = Seq((1L, "a", 5L), (2L, "a", -9L)).toDF("id", "dom", "tok")
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureTokenBudgets(bad, "dom", "tok", 100L).collect()
    }
    assert(e.getMessage.contains("negative total 'tok'"))
  }

  test("stratifiedSample: exactly ceil(num*n_s/den) rows per stratum, " +
      "deterministic membership, invariant to input partitioning") {
    val docs = mixCorpus // (id, dom, tok) — dom is the stratum
    val perStratum = docs.groupBy("dom").count()
      .as[(String, Long)].collect().toMap
    def run(parts: Int): Map[String, Set[Long]] =
      Sampling.stratifiedSample(docs.repartition(parts), "dom", "id",
          num = 1, den = 3)
        .as[(Long, String)].collect()
        .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val a = run(1)
    // exact integer allocation per stratum, never rounded down
    for ((dom, n) <- perStratum)
      assert(a(dom).size == (n + 2) / 3,
        s"$dom drew ${a(dom).size} of $n at 1/3")
    // the draw is a pure function of (seed tag, ids): any partitioning
    // selects the SAME documents, not merely the same counts
    assert(run(13) == a, "stratified membership moved with partitioning")
  }
}
