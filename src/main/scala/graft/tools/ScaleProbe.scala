package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Growth-sanity probe: the bench measures one scale factor, so a plan
  * whose cost grows super-linearly (a quietly quadratic candidate stage,
  * a window that sorts what an aggregate should bound) looks fine at
  * sf0.1 and detonates at 100 TB. This tool replicates the sf0.1 FACT
  * tables N× — shifting only primary keys, so every foreign key still
  * lands inside the (unscaled) dimension ranges and join semantics are
  * preserved copy-by-copy — then times a plan-diverse headline subset at
  * 1× and N× and prints per-query growth ratios. ratio/N ≈ 1 is linear;
  * per-copy ratios well above 1 flag the plan for a shuffle audit.
  *
  * Usage: runMain graft.tools.ScaleProbe [copies]   (default 5)
  */
object ScaleProbe {

  /** Queries probed: scans, partial aggs, broadcast-dim joins, a big
    * join, a window, global top-k, and the packed as-of join — every
    * shuffle shape the battery leans on. */
  val probed: Seq[String] = Seq(
    "q1_agg", "q_filter_scan", "q3_shipping_priority", "q5_region_revenue",
    "q10_returned_revenue", "q_join_left", "q_window_rank", "q_topk",
    "q_having", "q_tumbling_window", "q_join_asof_fast",
    // event-time family at REAL 2024-range timestamps (r11 probed these
    // against unit-collapsed 1970 data — VERDICT r11 §next #5): copies
    // densify the fixed time range, so windows/sessions gain rows, not
    // count — the aggregation must track the scan
    "q_sliding_window", "q_session_window",
    // r12: the range-exchange + partition-offset exact-rank machinery
    // (shared by EntityRes and the equi-depth histogram) — rank cost
    // must track the scan, never a global sort
    "q_histogram_equi",
    // the hot-key-safe two-phase window forms: replication grows the
    // per-key frames (copies share the custkey range), so these measure
    // exactly the hot-key growth the bucket split exists for
    "q_window_running_2p", "q_window_trailing_2p",
    // r18: token-budgeted mixture + the full epoch composite. The
    // budgets are gate-fixed literals, so at N× corpus the selected
    // copy mass stays ~constant while the scan + the single window
    // exchange grow — the ratio must track the scan, never a
    // per-domain global sort
    "q_token_budget_mix", "q_epoch_compose")

  /** Dedup-family probes over the replicated document/embedding tables.
    * `dedup_ngram` runs the registered query; the embedding path calls
    * [[graft.operators.Similarity.embeddingPairs]] with AUTO rowBits
    * directly — the same sizing the gate query now uses (since r19 the
    * gates derive rowBits from the corpus count and the oracle's __rb
    * CTE replicates the rule, so grown corpora re-block in lockstep). */
  val dedupProbed: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "dedup_ngram" -> graft.SparkEntry.queries("dedup_ngram"),
    // post-cap banded minhash: content-disjoint copies replicate each
    // copy's duplicate clusters without merging them, so band-bucket
    // occupancy stays at the within-copy value and candidates must grow
    // ~linearly — the divert path's accounting is exercised only if a
    // bucket tops the cap
    "dedup_minhash" -> graft.SparkEntry.queries("dedup_minhash"),
    "dedup_embedding" -> ((s, d) => graft.operators.Similarity
      .embeddingPairs(graft.sources.Tables.embeddings(s, d))),
    "text_familiarity" -> graft.SparkEntry.queries("text_familiarity"),
    "dedup_incremental" -> graft.SparkEntry.queries("dedup_incremental"),
    "dedup_embedding_incr" -> ((s, d) => {
      val e = graft.sources.Tables.embeddings(s, d)
      graft.operators.Similarity.crossEmbeddingPairs(
        e.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 1),
        e.filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0))
    }),
    // both sides (corpus and eval split) replicate together, so the
    // probe measures the bitmap build + prefiltered scan + confirm at
    // grown posting volume — the fpp-bounded candidate stream should
    // keep the whole plan ~linear per copy
    "decontam_bloom" -> graft.SparkEntry.queries("decontam_bloom"),
    // content-disjoint copies share no 8-token windows, so df stays at
    // the within-copy value and the posting self-join grows linearly in
    // copies — the window-gram analogue of dedup_ngram's exact-linear
    // candidate law, at far lower absolute volume (long windows are rare)
    "dedup_substring" -> graft.SparkEntry.queries("dedup_substring"),
    // two-phase prefix sum: the driver-side bucket table grows with
    // copies (rows/4096) but stays metadata-scale; the within-bucket
    // window partitions stay bounded, so wall should track the scan
    "text_pack" -> graft.SparkEntry.queries("text_pack"),
    // bounded-aggregator keyword extraction: content-disjoint copies
    // grow the vocabulary ~linearly (each copy's ring-rotated tokens
    // are new terms), so the tf/df folds and the unhinted vocab attach
    // must track the scan — a super-copy ratio here would mean the
    // attach or the top-k stage went row-quadratic
    "text_keyterms" -> graft.SparkEntry.queries("text_keyterms"),
    // corpus-level window dedup: rotated copies share no 16-token
    // windows, so the frequent set stays within-copy-sized and both
    // key-only shuffles must track the scan
    "dedup_paragraphs" -> graft.SparkEntry.queries("dedup_paragraphs"),
    // fixed 4×512 sketch state + exact-count gate apparatus: nothing
    // but the token scan is allowed to grow
    "q_countmin" -> graft.SparkEntry.queries("q_countmin"),
    // scan-only hashed-model inference: the zero-shuffle plan's growth
    // IS the scan's
    "text_quality_model" -> graft.SparkEntry.queries("text_quality_model"),
    // per-group signatures: the 20 sources persist across copies while
    // the corpus grows, so everything past the partial aggregate is a
    // constant G·k-row table — wall must track the signature scan
    "q_corpus_overlap" -> graft.SparkEntry.queries("q_corpus_overlap"),
    // r13: reference-LM scoring — train and target both grow with
    // copies, the content-disjoint rotation grows the vocabulary
    // ~linearly, so the two model tables and the attach joins must
    // track the scan like text_keyterms' (post-persist-fix) shape
    "text_lm_score" -> graft.SparkEntry.queries("text_lm_score"),
    // r13: BM25 retrieval — rotated copies grow the vocabulary AND the
    // query set ~linearly (the % 29 split lands on a shifted residue
    // per copy since 1e9 % 29 = 18, and content-disjoint text keeps
    // each query's matches inside its own copy), so postings, df
    // attach, query join, and the bounded per-query top-k must all
    // track the scan
    "text_bm25" -> graft.SparkEntry.queries("text_bm25"),
    // df-capped inverted index: postings grow linearly and per-term df
    // stays within-copy, so no reducer outgrows the cap
    "text_index" -> graft.SparkEntry.queries("text_index"),
    // tokenizer train + apply: every merge round's pair space is
    // bounded by the evolving symbol vocabulary; the distinct-word
    // table grows ~linearly under rotation, so the per-round folds and
    // the final re-segmentation must track the vocab scan
    "text_bpe_encode" -> graft.SparkEntry.queries("text_bpe_encode"),
    // r13.2: lossless prefix-filter similarity join — rotated copies
    // keep shingle df within-copy, so the global order's prefix cut,
    // the candidate join (within-copy by content-disjointness) and the
    // verify must all track the scan; a super-copy ratio would mean
    // common-shingle prefixes leaked across copies
    "q_simjoin_prefix" -> graft.SparkEntry.queries("q_simjoin_prefix"),
    // r13.2: PCA sufficient statistics — the exploded-triangle fold is
    // d²/row flat work collapsing into a d²-bounded hash agg; growth
    // must be exactly the scan's
    "q_pca_gram" -> graft.SparkEntry.queries("q_pca_gram"),
    // r13.2: hybrid RRF at its DEPLOYMENT legs — BM25 (linear match
    // stream) + IVF dense retrieval (nprobe cells per query, not the
    // brute gate leg, which is exhaustive-quadratic by definition);
    // fusion itself moves ≤ legs·k rows per query at any scale
    "retrieval_rrf_ivf" ->
      ((s, d) => graft.SparkEntry.benchOverrides("retrieval_rrf")(s, d)))

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(5)
    // optional 2nd arg: comma-separated probe-row filter (local spot
    // runs of newly added rows); filtered runs print per-query ratios
    // only and skip the specialty sections + JSON artifact
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").toSet else Set.empty
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = graft.sources.Scratch.dir(s"scale${copies}x")
    buildScaled(spark, base, out, copies)

    def timed(dir: String, name: String,
              q: (SparkSession, String) => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def time(dir: String, name: String): Double =
      timed(dir, name, graft.SparkEntry.queries(name))
    // warm-up both directions so codegen/scan-cache cold starts don't
    // masquerade as growth
    time(base, "q1_agg"); time(out, "q1_agg")

    // Fixed-work contention sentinel (VERDICT r13 #1): a corpus-
    // independent compute — a hash fold over a constant range — timed
    // at the start, middle and end of the probe. Its cost never varies
    // with `copies`, so (a) spread WITHIN a run flags transient box
    // contention during that run, and (b) drift ACROSS artifacts flags
    // a busy box; PROBE_r13b's q3 ratio 33.15 at identical candidate
    // counts would have self-flagged on both.
    val sentinelTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    // ONE pipeline definition for the timed runs AND the warm-up — the
    // warm-up exists to pre-JIT exactly this pipeline, so a second
    // hand-written copy could silently stop covering it
    def sentinelRun(): Unit =
      spark.range(0L, 200000000L, 1L, cpus.toInt)
        // bounded summand: a raw Σ xxhash64 overflows long (ANSI) at
        // 2·10⁸ full-range terms; the mod keeps the hash work intact
        .select(sum(pmod(xxhash64(col("id")), lit(1000L))).as("h"))
        .write.format("noop").mode("overwrite").save()
    // each label is the MEDIAN of three back-to-back runs (r19): the
    // detector exists to flag SUSTAINED box contention that would bias
    // the growth ratios measured over minutes — a single transient
    // spike (one scheduler hiccup during one 0.5 s run) flagged the
    // whole r18 artifact as contended while every later re-run was
    // quiet. The median keeps sustained contention fully visible (all
    // three runs slow → the median is slow) and discards the one-run
    // spike that measures nothing about the surrounding ratios.
    def sentinel(label: String): Unit = {
      val ts = (0 until 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        sentinelRun()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      sentinelTimes += ts(1)
      println(f"[scaleprobe] sentinel($label) ${ts(1)}%5.2fs " +
        s"(3 runs ${ts.map(t => f"$t%.2f").mkString(", ")}s)")
    }
    // warm the sentinel's OWN path untimed first: three consecutive
    // r18 probe runs showed the start sentinel 1.6–1.8× the later two
    // (0.76–0.87s vs 0.44–0.51s) with the later pair agreeing tightly
    // in every run — codegen/JIT of the range→hash→noop pipeline, not
    // contention. Billing the instrument's warm-up to the spread turns
    // the contention detector into a JIT detector and false-flags
    // quiet boxes; the general warm-up queries above don't cover this
    // exact pipeline.
    sentinelRun()
    sentinel("start")

    def keep(n: String): Boolean = only.isEmpty || only(n)
    val rows = probed.filter(keep).map { name =>
      val t1 = time(base, name)
      val tN = time(out, name)
      (name, t1, tN, tN / t1)
    } ++ dedupProbed.filter(p => keep(p._1)).map { case (name, q) =>
      val t1 = timed(base, name, q)
      val tN = timed(out, name, q)
      (name, t1, tN, tN / t1)
    }
    sentinel("mid")
    println(f"""[scaleprobe] copies=$copies base=$base""")
    rows.foreach { case (n, t1, tN, r) =>
      println(f"[scaleprobe] $n%-22s t1=$t1%6.2fs t${copies}x=$tN%6.2fs ratio=$r%5.2f perCopy=${r / copies}%4.2f")
    }
    // BM25's direct growth signal: the term-level match stream
    // |Σ_q Σ_t df(t)| — exhaustive BM25's cost by definition. Rotated
    // copies keep df within-copy while queries grow with copies, so the
    // law is perCopy ≈ 1 (linear matches); super-copy growth here would
    // mean cross-copy term leakage or a df stage gone quadratic.
    val (bm1, bmN) =
      if (!keep("text_bm25")) (0L, 0L)
      else {
        def bm25Matches(dir: String): Long = {
          val docs = graft.sources.Tables.documents(spark, dir)
          graft.operators.TextOps.bm25TermScores(
            docs.filter(col("doc_id") % 29 =!= 0),
            docs.filter(col("doc_id") % 29 === 0)
              .select(col("doc_id").as("query_id"),
                concat_ws(" ", slice(
                  graft.operators.TextOps.tokens(col("text")), 1, 6))
                  .as("query_text")),
            "doc_id", "text", "query_id", "query_text", 1.0).count()
        }
        val b1 = bm25Matches(base)
        val bN = bm25Matches(out)
        println(f"[scaleprobe] bm25 term matches: $b1 -> $bN " +
          f"ratio=${bN.toDouble / b1}%5.2f perCopy=${bN.toDouble / b1 / copies}%4.2f")
        (b1, bN)
      }
    if (only.nonEmpty) { spark.stop(); return }
    // the banded blocking's direct linearity signal: CANDIDATE counts at
    // 1x and Nx under auto rowBits — time ratios fold in fixed overheads,
    // the candidate stream is the thing that must not go quadratic
    // Raw count ratios fold in the bucket-skew factor κ, which grows
    // ≈ +0.08 per corpus doubling on real embeddings (PROBE_EMBED_r13
    // .json pins the curve out to 62 copies), so "perCopy" drifts above
    // 1 even though the plan is bounded. Report the law's own terms too:
    // per-vector candidate rate and its utilization of the asserted
    // bands·B·κmax/2 budget (κmax = 4, CandidateBoundSpec) — utilization
    // ≤ 1 IS the linearity claim; the occ > 1000 hub-star divert caps
    // the worst case at bands·999/2 per vector regardless.
    def candidates(dir: String): (Long, Long, Int, Double) = {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val rb = graft.operators.Similarity.autoRowBits(n)
      val banded = graft.operators.Similarity.withBandKeys(e,
        graft.operators.Similarity.DefaultBands, rb)
      val kappa = banded.groupBy("band_idx", "band_key")
        .agg(count(lit(1)).as("occ"))
        .agg((avg(col("occ") * col("occ")) / (avg("occ") * avg("occ"))))
        .head().getDouble(0)
      val c = graft.operators.Similarity.embeddingCandidates(banded).count()
      (n, c, rb, kappa)
    }
    val (n1, c1, rb1, k1) = candidates(base)
    val (nN, cN, rbN, kN) = candidates(out)
    val candPerCopy = cN.toDouble / c1 / copies
    val budgetPerVec = graft.operators.Similarity.DefaultBands * 8 * 4 / 2.0
    val (pv1, pvN) = (c1.toDouble / n1, cN.toDouble / nN)
    println(f"[scaleprobe] banded candidates: n=$n1 rb=$rb1 cand=$c1 -> " +
      f"n=$nN rb=$rbN cand=$cN ratio=${cN.toDouble / c1}%5.2f perCopy=$candPerCopy%4.2f " +
      f"candPerVec=$pv1%.1f->$pvN%.1f (budget $budgetPerVec%.0f) kappa=$k1%.2f->$kN%.2f")
    // same direct signal for the rare-shingle path (dedup_ngram /
    // dedup_containment): candidate pairs and rare postings at 1x and
    // Nx. The analytic bound is |cand| <= postings * (maxDf-1) / 2 —
    // content-disjoint copies keep per-shingle df unchanged, so both
    // postings and candidates should grow ~linearly (perCopy ~= 1); a
    // perCopy well above 1 would mean cross-copy shingle leakage or a
    // df-cap stage gone quadratic (asserted at sf0.001 in
    // CandidateBoundSpec, measured here at probe scale)
    def ngramCandidates(dir: String): (Long, Long) = {
      val docs = graft.sources.Tables.documents(spark, dir)
      val cand = graft.operators.Dedup
        .rareShingleCandidates(docs, "doc_id", "text", 20)
        .select("doc_a", "doc_b").count()
      val postings = graft.operators.Dedup
        .shingleHashesFlat(docs, "doc_id", "text")
        .select(explode(col("hs"))).count()
      (cand, postings)
    }
    val (g1, p1) = ngramCandidates(base)
    val (gN, pN) = ngramCandidates(out)
    val ngramPerCopy = gN.toDouble / g1 / copies
    println(f"[scaleprobe] ngram candidates: cand=$g1 postings=$p1 -> " +
      f"cand=$gN postings=$pN ratio=${gN.toDouble / g1}%5.2f perCopy=$ngramPerCopy%4.2f")
    // ingestion steady state: the self-maintaining loop's 100 TB claim
    // is "per-batch cost independent of held-corpus size" — the one-shot
    // cross probes above never measure it. Build a persisted index over
    // the 1x and Nx corpora (one-time cost, untimed), then run the SAME
    // small batch through the REAL foreachBatch body
    // (StreamOps.processIngestBatch: check + pairs write + novel append
    // + commit marker) against each. The wall ratio is the growth of
    // per-batch cost with corpus size; the candidate ratio is the
    // occupancy-bounded quantity that must stay ~1 (the batch's band
    // keys hit copy-0's buckets plus collisions, regardless of how many
    // content-disjoint copies the index holds).
    def steadyIngest(dir: String, tag: String): (Double, Long) = {
      val idxDir = graft.sources.Scratch.dir(s"probe-ingest-$tag")
      graft.operators.Dedup.writeMinhashIndex(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text", idxDir)
      val baseDocs = graft.sources.Tables.documents(spark, base)
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      // 100 docs held by every corpus (copy 0 verbatim) + 100 novel docs
      // (reverse-alphabet translate — a reflection, not any of the
      // Caesar rotations, so content-disjoint from every copy; ids
      // shifted far past the copy-offset range)
      val batch = baseDocs.sort("doc_id").limit(100).unionByName(
        baseDocs.sort(desc("doc_id")).limit(100)
          .withColumn("doc_id", col("doc_id") + 100000000000L)
          .withColumn("text", translate(col("text"),
            alpha + alpha.toUpperCase,
            alpha.reverse + alpha.reverse.toUpperCase))).persist()
      batch.count()
      val index = graft.operators.Dedup.readMinhashIndex(spark, idxDir)
      // candidate volume first (also warms both scans identically)
      val cand = graft.operators.Dedup
        .crossMinhashPairs(batch, index, "doc_id", "text", 0.0).count()
      val outDir = graft.sources.Scratch.dir(s"probe-ingest-out-$tag")
      System.gc()
      val t0 = System.nanoTime()
      graft.streaming.StreamOps.processIngestBatch(batch, 0L, idxDir,
        outDir, 0.5)
      val t = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      (t, cand)
    }
    val (si1, sc1) = steadyIngest(base, "1x")
    val (siN, scN) = steadyIngest(out, s"${copies}x")
    println(f"[scaleprobe] ingest steady-state: t1=$si1%6.2fs t${copies}x=$siN%6.2fs " +
      f"ratio=${siN / si1}%5.2f cand=$sc1 -> $scN candRatio=${scN.toDouble / sc1}%5.2f")
    // The LOSSLESS ingestion path's steady state: fixed 200-doc batch
    // (100 held + 100 novel, the steadyIngest construction) checked
    // against a prefix index over the 1x / Nx corpus. The pair count
    // must stay flat (content-disjoint copies: only copy-0 matches);
    // wall may grow with the index's matched prefix-posting volume —
    // the quantity reported next to it.
    def steadyPrefix(dir: String, tag: String): (Double, Long) = {
      val idxDir = graft.sources.Scratch.dir(s"probe-pfx-$tag")
      graft.operators.SimJoin.writePrefixIndex(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text",
        6, 10, idxDir)
      val baseDocs = graft.sources.Tables.documents(spark, base)
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val batch = baseDocs.sort("doc_id").limit(100).unionByName(
        baseDocs.sort(desc("doc_id")).limit(100)
          .withColumn("doc_id", col("doc_id") + 100000000000L)
          .withColumn("text", translate(col("text"),
            alpha + alpha.toUpperCase,
            alpha.reverse + alpha.reverse.toUpperCase))).persist()
      batch.count()
      System.gc()
      val t0 = System.nanoTime()
      val nPairs = graft.operators.SimJoin
        .crossPrefixJoin(spark, batch, idxDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      (t, nPairs)
    }
    val (sp1, pp1) = steadyPrefix(base, "1x")
    val (spN, ppN) = steadyPrefix(out, s"${copies}x")
    println(f"[scaleprobe] prefix ingest steady-state: t1=$sp1%6.2fs " +
      f"t${copies}x=$spN%6.2fs ratio=${spN / sp1}%5.2f pairs=$pp1 -> $ppN")
    // BM25-index SERVING steady state: the r14 persisted-postings
    // claim is "per-batch serving cost is the match stream, independent
    // of index size". Build the index over the 1x / Nx corpus (one-time,
    // untimed), then serve the SAME fixed query batch (100 held copy-0
    // prefixes + 100 novel reflected texts — the steadyIngest
    // construction as queries). Content-disjoint copies keep the held
    // queries' term df within copy-0, so the match stream must stay
    // FLAT; the timed serve may grow only with the vocab-bounded df
    // fold — the honest sub-linear term, reported alongside.
    def steadyBm25(dir: String, tag: String): (Double, Long) = {
      val idxDir = graft.sources.Scratch.dir(s"probe-bm25-$tag")
      graft.operators.Bm25Index.write(
        graft.sources.Tables.documents(spark, dir), idxDir)
      val baseDocs = graft.sources.Tables.documents(spark, base)
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val batch = baseDocs.sort("doc_id").limit(100).unionByName(
          baseDocs.sort(desc("doc_id")).limit(100)
            .withColumn("doc_id", col("doc_id") + 100000000000L)
            .withColumn("text", translate(col("text"),
              alpha + alpha.toUpperCase,
              alpha.reverse + alpha.reverse.toUpperCase)))
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            graft.operators.TextOps.tokens(col("text")), 1, 6))
            .as("query_text")).persist()
      batch.count()
      // the match stream |Σ_q Σ_t df(t)| — the serve's defining cost
      val matchRows = batch
        .select(explode(array_distinct(
          graft.operators.TextOps.tokens(col("query_text")))).as("term"))
        .join(graft.operators.Bm25Index.foldedDf(spark, idxDir),
          Seq("term"))
        .agg(coalesce(sum(col("df")), lit(0L))).head().getLong(0)
      System.gc()
      val t0 = System.nanoTime()
      graft.operators.Bm25Index.crossBm25TopK(spark, batch, idxDir, 5)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      batch.unpersist()
      (t, matchRows)
    }
    val (sb1, mr1) = steadyBm25(base, "1x")
    val (sbN, mrN) = steadyBm25(out, s"${copies}x")
    println(f"[scaleprobe] bm25 serve steady-state: t1=$sb1%6.2fs " +
      f"t${copies}x=$sbN%6.2fs ratio=${sbN / sb1}%5.2f " +
      f"matches=$mr1 -> $mrN matchRatio=${mrN.toDouble / math.max(1, mr1)}%5.2f")
    // Maintenance family steady state (VERDICT r12 #4): the claim
    // "refresh scans state + delta, never the corpus" as a measured
    // ratio. State is built over the 1x / Nx corpus UNTIMED (that's the
    // one-time build); the timed refresh folds the SAME fixed delta into
    // each — if the claim holds, the wall ratio is ~1 no matter how much
    // corpus the state summarizes (state rows = key cardinality).
    // snapshotDiff is different by design: its SCAN is linear in the
    // snapshots (ratio ≈ copies, reported per-copy) while its OUTPUT is
    // churn-bounded — both measured, same fixed churn at both scales.
    def steadyMaintain(dir: String, tag: String): (Double, Double, Double, Double, Double, Long) = {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val delta = spark.read.parquet(s"$base/orders.parquet").limit(1000)
        .withColumn("o_orderkey", col("o_orderkey") + 900000000L).persist()
      delta.count()
      val aggDir = graft.sources.Scratch.dir(s"probe-maint-agg-$tag")
      graft.operators.Maintain.writeAggState(orders, "o_orderstatus",
        "o_totalprice", aggDir)
      System.gc()
      var t0 = System.nanoTime()
      graft.operators.Maintain.mergeAggState(spark, aggDir, delta,
        "o_orderstatus", "o_totalprice")
        .write.format("noop").mode("overwrite").save()
      val tAgg = (System.nanoTime() - t0) / 1e9
      val dstDir = graft.sources.Scratch.dir(s"probe-maint-dst-$tag")
      graft.operators.Maintain.writeDistinctState(orders, "o_orderstatus",
        "o_custkey", dstDir)
      System.gc()
      t0 = System.nanoTime()
      graft.operators.Maintain.mergeDistinctState(spark, dstDir, delta,
        "o_orderstatus", "o_custkey")
        .write.format("noop").mode("overwrite").save()
      val tDst = (System.nanoTime() - t0) / 1e9
      // quantile histogram state: same law — refresh folds |keys|×bins
      // state rows + the fixed delta, corpus-independent
      val qhDir = graft.sources.Scratch.dir(s"probe-maint-qh-$tag")
      graft.operators.Maintain.writeQuantileState(orders, "o_orderstatus",
        "o_totalprice", qhDir, lo = 0.0, hi = 600000.0, bins = 120)
      System.gc()
      t0 = System.nanoTime()
      graft.operators.Maintain.mergeQuantileState(spark, qhDir, delta,
        "o_orderstatus", "o_totalprice")
        .write.format("noop").mode("overwrite").save()
      val tQh = (System.nanoTime() - t0) / 1e9
      // top-k leaderboard state: refresh folds |groups|×k state rows +
      // the fixed delta through the bounded top-k buffer — same
      // corpus-independence law as the other three legs
      val tkDir = graft.sources.Scratch.dir(s"probe-maint-tk-$tag")
      graft.operators.Maintain.writeTopKState(orders, "o_orderstatus",
        "o_orderkey", "o_totalprice", 10, tkDir)
      System.gc()
      t0 = System.nanoTime()
      graft.operators.Maintain.mergeTopKState(spark, tkDir, delta,
        "o_orderstatus", "o_orderkey", "o_totalprice")
        .write.format("noop").mode("overwrite").save()
      val tTk = (System.nanoTime() - t0) / 1e9
      // fixed churn: mutate the payload of copy-0 keys < 600 only, so
      // the same ~600 rows change at every scale
      val next = orders.withColumn("o_orderpriority",
        when(col("o_orderkey") < 600, lit("churned"))
          .otherwise(col("o_orderpriority")))
      System.gc()
      t0 = System.nanoTime()
      val diffRows = graft.operators.Maintain
        .snapshotDiff(orders, next, "o_orderkey", "o_orderpriority").count()
      val tDiff = (System.nanoTime() - t0) / 1e9
      delta.unpersist()
      (tAgg, tDst, tQh, tTk, tDiff, diffRows)
    }
    val (ma1, md1, mq1, mt1, sd1, dr1) = steadyMaintain(base, "1x")
    val (maN, mdN, mqN, mtN, sdN, drN) = steadyMaintain(out, s"${copies}x")
    println(f"[scaleprobe] maintain steady-state: agg $ma1%5.2fs->$maN%5.2fs " +
      f"ratio=${maN / ma1}%4.2f  distinct $md1%5.2fs->$mdN%5.2fs ratio=${mdN / md1}%4.2f  " +
      f"quantile $mq1%5.2fs->$mqN%5.2fs ratio=${mqN / mq1}%4.2f  " +
      f"topk $mt1%5.2fs->$mtN%5.2fs ratio=${mtN / mt1}%4.2f  " +
      f"diff $sd1%5.2fs->$sdN%5.2fs perCopy=${sdN / sd1 / copies}%4.2f " +
      f"diffRows=$dr1->$drN")
    // index rebuild: honestly linear in index size (it re-cuts every
    // stored signature) — the probed law is per-copy ratio ~1, i.e. the
    // rebuild tracks the index scan and nothing is quadratic in it
    def rebuildProbe(dir: String, tag: String): Double = {
      val idxDir = graft.sources.Scratch.dir(s"probe-rebuild-$tag")
      graft.operators.Dedup.writeMinhashIndex(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text",
        idxDir, numHashes = 16, bands = 2)
      System.gc()
      val t0 = System.nanoTime()
      graft.operators.Dedup.rebuildMinhashIndex(spark, idxDir,
        numHashes = 16, bands = 4)
      graft.operators.Dedup.compactMinhashIndex(spark, idxDir)
      (System.nanoTime() - t0) / 1e9
    }
    val rb1t = rebuildProbe(base, "1x")
    val rbNt = rebuildProbe(out, s"${copies}x")
    println(f"[scaleprobe] index rebuild: t1=$rb1t%5.2fs t${copies}x=$rbNt%5.2fs " +
      f"ratio=${rbNt / rb1t}%5.2f perCopy=${rbNt / rb1t / copies}%4.2f")
    // IVF serving steady state (VERDICT r14 #6): both serving paths
    // against a standing index built over the 1x / Nx corpus (untimed),
    // same fixed 5-query batch. An IVF probe reads nprobe/nCentroids of
    // the corpus BY DESIGN, so the honest law is LINEAR wall growth
    // (perCopy ≈ 1 — the probed-cell volume grows with the cells), with
    // the quantized path's wall at or under the float path's at every
    // scale: its phase-1 scan reads the 1 byte/dim codes column of the
    // SAME probed cells, so any super-float ratio would mean the
    // shortlist or re-rank stage stopped being shortlist-bounded.
    def ivfServe(dir: String, tag: String): (Double, Double) = {
      val idxDir = graft.sources.Scratch.dir(s"probe-ivfserve-$tag")
      graft.operators.Similarity.writeIvfIndex(
        graft.sources.Tables.embeddings(spark, dir), idxDir)
      val idx = graft.operators.Similarity.readIvfIndex(spark, idxDir)
      val q = graft.sources.Tables.embeddings(spark, dir)
        .filter(col("vec_id") < 5)
      def t(df: => DataFrame): Double = {
        df.write.format("noop").mode("overwrite").save() // warm
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (t(graft.operators.Similarity.ivfTopKIndexed(idx, q, 10)),
        t(graft.operators.Similarity.ivfTopKQuantized(idx, q, 10)))
    }
    val (if1, iq1) = ivfServe(base, "1x")
    val (ifN, iqN) = ivfServe(out, s"${copies}x")
    println(f"[scaleprobe] ivf serve: float $if1%5.2fs->$ifN%5.2fs " +
      f"perCopy=${ifN / if1 / copies}%4.2f  quantized $iq1%5.2fs->$iqN%5.2fs " +
      f"perCopy=${iqN / iq1 / copies}%4.2f quantized/float=${iqN / ifN}%4.2f")
    // Slack-state fold cost as groups grow (VERDICT r14 #6): the
    // deletion-aware top-k claim is "refresh scans |state| + |delta| +
    // |tombstones|". Key the board by o_orderkey/10 so GROUP count (and
    // with it state rows) grows with copies, then fold the SAME fixed
    // delta + tombstone set into the 1x and Nx states — the wall must
    // track the state scan (perCopy ≈ 1, linear), never groups².
    def slackFold(dir: String, tag: String): (Double, Long) = {
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .withColumn("grp", (col("o_orderkey") / 10).cast("long"))
      val st = graft.sources.Scratch.dir(s"probe-slack-$tag")
      graft.operators.Maintain.writeTopKSlackState(o, "grp", "o_orderkey",
        "o_totalprice", 5, 5, st)
      val delta = spark.read.parquet(s"$base/orders.parquet").limit(1000)
        .withColumn("grp", (col("o_orderkey") / 10).cast("long"))
        .withColumn("o_orderkey", col("o_orderkey") + 900000000L)
        .select("grp", "o_orderkey", "o_totalprice").persist()
      val tomb = spark.read.parquet(s"$base/orders.parquet").limit(200)
        .withColumn("grp", (col("o_orderkey") / 10).cast("long"))
        .select("grp", "o_orderkey").persist()
      delta.count(); tomb.count()
      val stateRows = spark.read.parquet(s"$st/state").count()
      System.gc()
      val t0 = System.nanoTime()
      graft.operators.Maintain.foldTopKSlackState(spark, st, delta, tomb,
        "grp", "o_orderkey", "o_totalprice")
      val t = (System.nanoTime() - t0) / 1e9
      delta.unpersist(); tomb.unpersist()
      (t, stateRows)
    }
    val (sf1, sr1) = slackFold(base, "1x")
    val (sfN, srN) = slackFold(out, s"${copies}x")
    println(f"[scaleprobe] slack fold: t1=$sf1%5.2fs t${copies}x=$sfN%5.2fs " +
      f"perCopy=${sfN / sf1 / copies}%4.2f stateRows=$sr1->$srN")
    // Recall under a deliberately drifted append (VERDICT r15 pre-work /
    // r14 #3): append a rotation-shifted batch (orthogonal — true
    // cosines survive, but the stored quantizer never saw the
    // distribution) with allowCellDrift=true, then measure top-10
    // recall vs brute-force truth for in-distribution and shifted
    // queries. The GAP is what the drift sentinel's refusal protects
    // against; the sentinel itself refuses exactly this batch.
    def driftRecall(): (Double, Double) = {
      val e = graft.sources.Tables.embeddings(spark, base)
      val idxDir = graft.sources.Scratch.dir("probe-driftrec")
      graft.operators.Similarity.writeIvfIndex(e, idxDir)
      val shifted = perturbEmbeddings(e, 7)
        .withColumn("vec_id", col("vec_id") + 500000000L)
      graft.operators.Similarity.appendIvfIndex(spark, idxDir, shifted,
        batchId = Some(0L), allowCellDrift = true)
      val idx = graft.operators.Similarity.readIvfIndex(spark, idxDir)
      val corpus = idx.assigned
        .select(col("vec_id"), col("v").as("embedding"))
      def recall(queries: DataFrame): Double = {
        def pairs(df: DataFrame): Set[(Long, Long)] =
          df.select(col("qid"), col("vec_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        val truth = pairs(graft.operators.Similarity
          .bruteForceTopK(corpus, queries, 10))
        val got = pairs(graft.operators.Similarity
          .ivfTopKIndexed(idx, queries, 10))
        got.intersect(truth).size.toDouble / math.max(1, truth.size)
      }
      (recall(e.filter(col("vec_id") < 5)),
        recall(shifted.filter(col("vec_id") < 500000005L)))
    }
    val (recIn, recShift) = driftRecall()
    println(f"[scaleprobe] drift recall: inDist=$recIn%4.2f " +
      f"shiftedAppend=$recShift%4.2f (gap = what the cell-drift " +
      "sentinel's refusal protects against)")
    // Compaction effect (r15): a CDC-fed index accretes one file set
    // per change batch; serve cost picks up file-open and listing
    // overhead on top of the real scan. Fragment a BM25 index with
    // many tiny change batches, time the SAME serve before and after
    // Bm25Index.compact (which provably never moves the board — the
    // IndexMaintenanceSpec law and the in-gate oracle check). The
    // measured quantity is what the hygiene op buys at stream cadence.
    def compactEffect(): (Int, Int, Double, Double) = {
      val docs = graft.sources.Tables.documents(spark, base)
      val idxDir = graft.sources.Scratch.dir("probe-compact")
      graft.operators.Bm25Index.write(
        docs.filter(col("doc_id") % 2 === 0), idxDir)
      val k = 24
      (0 until k).foreach { b =>
        graft.operators.Bm25Index.applyCdc(spark, idxDir,
          docs.filter(col("doc_id") % (2 * k) === 2 * b + 1),
          docs.filter(col("doc_id") % 2 === 0 &&
            col("doc_id") % (10 * k) === 10 * b).select("doc_id"),
          batchId = b.toLong)
      }
      def files(): Int = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        // count the CURRENT version root only: the one-commit retention
        // grace keeps the previous (fragmented) version on disk for open
        // readers, but serving never touches it — counting it would
        // report compaction as GROWING the file count
        walk(new java.io.File(
          graft.operators.Dedup.indexRoot(spark, idxDir)))
          .count(_.getName.endsWith(".parquet"))
      }
      val q2 = docs.filter(col("doc_id") % 29 === 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(graft.operators.TextOps.tokens(col("text")), 1, 6))
            .as("query_text"))
      def serve(): Double = {
        val df = graft.operators.Bm25Index.crossBm25TopK(spark, q2,
          idxDir, k = 5)
        df.write.format("noop").mode("overwrite").save() // warm
        System.gc()
        val t0 = System.nanoTime()
        graft.operators.Bm25Index.crossBm25TopK(spark, q2, idxDir, k = 5)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val fFrag = files()
      val tFrag = serve()
      graft.operators.Bm25Index.compact(spark, idxDir)
      val fCpt = files()
      val tCpt = serve()
      (fFrag, fCpt, tFrag, tCpt)
    }
    val (cfF, cfC, ctF, ctC) = compactEffect()
    println(f"[scaleprobe] compact effect: files $cfF->$cfC " +
      f"serve $ctF%5.2fs->$ctC%5.2fs speedup=${ctF / ctC}%4.2f")
    // Sharded maintenance unit (r17): the monolithic home's compact
    // rewrites the WHOLE artifact however concentrated the churn; the
    // sharded home's selective compact folds only the shards past the
    // file bound. Same base corpus, same CONCENTRATED churn (12 change
    // batches whose ids all route to one of 8 shards), then each form's
    // compaction — measured as bytes rewritten (the new serving version
    // dir(s)) and wall. The ratio is the 100 TB claim in miniature:
    // maintenance cost ∝ churned shards, not corpus.
    def shardCompact(): (Long, Long, Double, Double, Int) = {
      val docs = graft.sources.Tables.documents(spark, base)
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val hot = docs.filter(col("doc_id") % 2 === 1 &&
        graft.operators.ShardedIndex.shardOf(col("doc_id"), 8) === 3)
        .select("doc_id", "text")
      val mono = graft.sources.Scratch.dir("probe-shcpt-mono")
      val home = graft.sources.Scratch.dir("probe-shcpt-shard")
      graft.operators.Bm25Index.write(corpus, mono)
      graft.operators.ShardedIndex.writeBm25(corpus, home, shards = 8)
      (0 until 12).foreach { b =>
        val slice = hot.filter(col("doc_id") % 12 === b)
        graft.operators.Bm25Index.append(spark, mono, slice,
          batchId = Some(b.toLong))
        graft.operators.ShardedIndex.append(spark, home, slice,
          batchId = b.toLong)
      }
      def bytesOf(dir: String): Long = {
        val p = new org.apache.hadoop.fs.Path(
          graft.operators.Dedup.indexRoot(spark, dir))
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      }
      val t0 = System.nanoTime()
      graft.operators.Bm25Index.compact(spark, mono)
      val wallMono = (System.nanoTime() - t0) / 1e9
      val bytesMono = bytesOf(mono) // the whole rewritten version
      // bound = the quiet shards' file count: only the hot shard is past it
      val quietFiles = (0 until 8).filter(_ != 3).map { i =>
        val root = graft.operators.Dedup.indexRoot(spark,
          graft.operators.ShardedIndex.shardDir(home, i))
        val hp = new org.apache.hadoop.fs.Path(root)
        graft.operators.IndexAudit.countParquetFiles(
          hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
      }.max
      val t1 = System.nanoTime()
      val compacted = graft.operators.ShardedIndex.compact(spark, home,
        minFiles = quietFiles)
      val wallShard = (System.nanoTime() - t1) / 1e9
      val bytesShard = compacted
        .map(i => bytesOf(graft.operators.ShardedIndex.shardDir(home, i)))
        .sum
      (bytesMono, bytesShard, wallMono, wallShard, compacted.size)
    }
    val (shBm, shBs, shWm, shWs, shN) = shardCompact()
    println(f"[scaleprobe] shard compact: bytes mono=$shBm sharded=$shBs " +
      f"(ratio ${shBs.toDouble / shBm}%4.2f) wall $shWm%5.2fs->$shWs%5.2fs " +
      s"compactedShards=$shN/8")
    // Churn resilience for ANN serving (VERDICT r15 missing #3): the
    // delete-heavy twin of drift_recall. Tombstone ~50% of an IVF
    // index's vectors (batch-fragmented, like a real CDC feed), then
    // measure top-10 recall vs the LIVE-corpus brute-force truth and
    // the serve wall at each lifecycle station: fresh → deleted
    // (masked, cells thinned) → compacted (tomb folded, rows
    // preserved) → rebuilt (physical removal + retrain). Recall is the
    // semantics claim (masking serves the live board exactly as cut
    // cells allow); the serve walls price what masking costs and what
    // compact/rebuild each reclaim.
    // MULTI-SAMPLED (VERDICT r17 #6): the masked-vs-rebuilt recall gap's
    // sign flipped between single-draw runs (≈0 in r16, +0.20 in r17),
    // so the operational claim "masking is recall-safe under churn" now
    // rests on a DISTRIBUTION — 3 deterministic ~50% churn draws ×
    // nprobe ∈ {1, 2, 4}, each cell measuring masked and rebuilt recall
    // against the same live-corpus brute-force truth — reported per
    // cell plus min/median per station. Seed 0 keeps the historical
    // odd-residue draw and the full station walk (fresh → deleted →
    // compacted → rebuilt with serve walls) for trend continuity.
    def churnRecall(): (Seq[Double], Seq[Double],
                        Seq[(Int, Int, Double, Double)],
                        Seq[(Int, Int, Double)], Double) = {
      val e = graft.sources.Tables.embeddings(spark, base)
      val queries = e.filter(col("vec_id") < 5)
      def pairs(df: DataFrame): Set[(Long, Long)] =
        df.select(col("qid"), col("vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val cells =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double, Double)]
      // (seed, recommended nprobe, recall at it) per rebuilt station —
      // the operator answer to the masked-vs-rebuilt gap (r19):
      // recommendNprobe(freshRecall) names the setting that restores
      // the pre-churn recall on the rebuilt home
      val recCells =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
      var freshRec2 = 0.0
      var legacy: (Seq[Double], Seq[Double]) = (Nil, Nil)
      (0 until 3).foreach { seed =>
        val idxDir = graft.sources.Scratch.dir(s"probe-churnrec-$seed")
        graft.operators.Similarity.writeIvfIndex(e, idxDir)
        def recallAt(np: Int, truth: Set[(Long, Long)]): Double = {
          val idx = graft.operators.Similarity.readIvfIndex(spark, idxDir)
          pairs(graft.operators.Similarity.ivfTopKIndexed(idx, queries,
            10, nprobe = np))
            .intersect(truth).size.toDouble / math.max(1, truth.size)
        }
        def truthNow(): Set[(Long, Long)] = {
          val idx = graft.operators.Similarity.readIvfIndex(spark, idxDir)
          pairs(graft.operators.Similarity.bruteForceTopK(
            idx.assigned.select(col("vec_id"), col("v").as("embedding")),
            queries, 10))
        }
        def serveWall(): Double = {
          graft.operators.Similarity.ivfTopKIndexed(
            graft.operators.Similarity.readIvfIndex(spark, idxDir),
            queries, 10).write.format("noop").mode("overwrite").save()
          System.gc()
          val t0 = System.nanoTime()
          graft.operators.Similarity.ivfTopKIndexed(
            graft.operators.Similarity.readIvfIndex(spark, idxDir),
            queries, 10).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        // the churn draw: seed 0 = the historical odd residues; seeds
        // 1-2 = hash-selected ~50% (deterministic — xxhash64's fixed
        // seed — but a different membership per multiplier)
        val doomed =
          if (seed == 0) e.filter(col("vec_id") % 8 === 1 ||
            col("vec_id") % 8 === 3 || col("vec_id") % 8 === 5 ||
            col("vec_id") % 8 === 7)
          else e.filter(pmod(xxhash64(
            col("vec_id") * lit(seed * 2654435761L + 1L)), lit(2L)) === 0)
        // fresh station (seed 0 only, for trend continuity): recall at
        // the historical nprobe=2 vs the full-corpus truth + serve wall
        val freshStation =
          if (seed == 0) Some((recallAt(2, truthNow()), serveWall()))
          else None
        // fragmented across 4 tombstone batches, the way a delete-heavy
        // CDC feed lands it
        (0 until 4).foreach { b =>
          graft.operators.Similarity.deleteFromIvfIndex(spark, idxDir,
            doomed.filter(col("vec_id") % 4 === b).select("vec_id"),
            batchId = Some(b.toLong))
        }
        val truth = truthNow()
        val masked = Seq(1, 2, 4).map(np => np -> recallAt(np, truth)).toMap
        val (serveDel, serveComp) =
          if (seed == 0) {
            val sd = serveWall()
            graft.operators.Similarity.compactIvfIndex(spark, idxDir)
            (sd, Some(serveWall()))
          } else (0.0, None)
        graft.operators.Similarity.rebuildIvfIndex(spark, idxDir)
        Seq(1, 2, 4).foreach { np =>
          cells += ((seed, np, masked(np), recallAt(np, truth)))
        }
        if (seed == 0) freshRec2 = freshStation.get._1
        // the knob on the REBUILT station: the recommendation targets
        // the fresh (pre-churn) recall at the historical nprobe=2, and
        // the cell records the recall it actually restores
        val recNp = graft.operators.Similarity.recommendNprobe(
          spark, idxDir, queries, freshRec2, k = 10)
        recCells += ((seed, recNp, recallAt(recNp, truth)))
        if (seed == 0) {
          val (freshRec, freshServe) = freshStation.get
          // legacy stations at the historical nprobe=2. Compaction is
          // row-preserving with the quantizer untouched, so its board —
          // and recall — EQUALS the deleted station's by construction
          // (the law IvfIndexSpec pins); its serve wall is what changes.
          legacy = (Seq(freshRec, masked(2), masked(2),
            cells.find(c => c._1 == 0 && c._2 == 2).get._4),
            Seq(freshServe, serveDel, serveComp.get, serveWall()))
        }
      }
      (legacy._1, legacy._2, cells.toSeq, recCells.toSeq, freshRec2)
    }
    val (chRec, chServe, chCells, chRecCells, chFresh) = churnRecall()
    val chMasked = chCells.map(_._3).sorted
    val chRebuilt = chCells.map(_._4).sorted
    def median(xs: Seq[Double]): Double = xs(xs.size / 2)
    println(f"[scaleprobe] churn recall (fresh/del/compact/rebuild): " +
      s"recall ${chRec.map(r => f"$r%.2f").mkString("/")} " +
      s"serve ${chServe.map(t => f"$t%.2f").mkString("/")}s; " +
      s"cells (seed,np,masked,rebuilt): " +
      chCells.map(c => f"(${c._1},${c._2},${c._3}%.2f,${c._4}%.2f)")
        .mkString(" ") +
      f"; masked min/med ${chMasked.min}%.2f/${median(chMasked)}%.2f " +
      f"rebuilt min/med ${chRebuilt.min}%.2f/${median(chRebuilt)}%.2f")
    println(f"[scaleprobe] recommended nprobe on rebuilt stations " +
      f"(target=fresh $chFresh%.2f): " +
      chRecCells.map(c => f"(seed=${c._1},np=${c._2},recall=${c._3}%.2f)")
        .mkString(" "))
    // backup incrementality (r19): the rotation tick's copied bytes
    // must be ∝ churn, never ∝ home bytes — a ratio within ONE home,
    // so the base corpus is the right scale. steady tick = 0 copied;
    // churn tick ≈ the batch's partition files + rewritten control
    val (bkHome, bkSteady, bkChurn) = {
      val docs = graft.sources.Tables.documents(spark, base)
      val home = graft.sources.Scratch.dir("probe-bkdelta")
      val bh = graft.sources.Scratch.dir("probe-bkdelta-gens")
      graft.operators.Dedup.writeMinhashIndex(docs, "doc_id", "text", home)
      def copied(g: String): (Long, Long) = {
        val m = graft.operators.IndexBackup.backupMeta(spark, g)
        (m("copied_bytes").toLong, m("bytes").toLong)
      }
      graft.operators.IndexBackup.rotate(spark, home, bh, keep = 3)
      val s2 = copied(
        graft.operators.IndexBackup.rotate(spark, home, bh, keep = 3))
      graft.operators.Dedup.appendToMinhashIndex(
        docs.limit(200).withColumn("doc_id",
          col("doc_id") + 900000000L),
        "doc_id", "text", home, batchId = Some(3L))
      val s3 = copied(
        graft.operators.IndexBackup.rotate(spark, home, bh, keep = 3))
      (s3._2, s2._1, s3._1)
    }
    println(f"[scaleprobe] backup delta: home=$bkHome%d bytes, " +
      f"steady tick copied=$bkSteady%d, churn tick copied=$bkChurn%d " +
      f"(${100.0 * bkChurn / bkHome}%.1f%% of the home)")
    sentinel("end")
    val sentinelSpread = sentinelTimes.max / sentinelTimes.min
    println(f"[scaleprobe] sentinel spread=${sentinelSpread}%4.2f " +
      s"(runs ${sentinelTimes.map(t => f"$t%.2f").mkString(", ")}s; " +
      "spread well above ~1.5 means the box was contended mid-run — " +
      "re-measure before reading growth ratios)")
    val qs = rows.map { case (n, t1, tN, r) =>
      f""""$n":{"t1":$t1%.3f,"tN":$tN%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"scale_probe","copies":$copies,"queries":$qs,""" +
        f""""banded_candidates":{"c1":$c1,"cN":$cN,"perCopy":$candPerCopy%.3f,""" +
        f""""candPerVec1":$pv1%.1f,"candPerVecN":$pvN%.1f,"budgetPerVec":$budgetPerVec%.0f,""" +
        f""""kappa1":$k1%.3f,"kappaN":$kN%.3f},""" +
        f""""ngram_candidates":{"c1":$g1,"cN":$gN,"perCopy":$ngramPerCopy%.3f},""" +
        f""""ingest_steady":{"t1":$si1%.3f,"tN":$siN%.3f,"ratio":${siN / si1}%.3f,""" +
        f""""cand1":$sc1,"candN":$scN,"candRatio":${scN.toDouble / sc1}%.3f},""" +
        f""""prefix_ingest":{"t1":$sp1%.3f,"tN":$spN%.3f,"ratio":${spN / sp1}%.3f,""" +
        f""""pairs1":$pp1,"pairsN":$ppN},""" +
        f""""bm25_serve_steady":{"t1":$sb1%.3f,"tN":$sbN%.3f,"ratio":${sbN / sb1}%.3f,""" +
        f""""matches1":$mr1,"matchesN":$mrN},""" +
        f""""maintain_steady":{"aggT1":$ma1%.3f,"aggTN":$maN%.3f,"aggRatio":${maN / ma1}%.3f,""" +
        f""""distinctT1":$md1%.3f,"distinctTN":$mdN%.3f,"distinctRatio":${mdN / md1}%.3f,""" +
        f""""quantileT1":$mq1%.3f,"quantileTN":$mqN%.3f,"quantileRatio":${mqN / mq1}%.3f,""" +
        f""""topkT1":$mt1%.3f,"topkTN":$mtN%.3f,"topkRatio":${mtN / mt1}%.3f,""" +
        f""""diffT1":$sd1%.3f,"diffTN":$sdN%.3f,"diffPerCopy":${sdN / sd1 / copies}%.3f,""" +
        f""""diffRows1":$dr1,"diffRowsN":$drN},""" +
        f""""index_rebuild":{"t1":$rb1t%.3f,"tN":$rbNt%.3f,"perCopy":${rbNt / rb1t / copies}%.3f},""" +
        f""""ivf_serve":{"floatT1":$if1%.3f,"floatTN":$ifN%.3f,"floatPerCopy":${ifN / if1 / copies}%.3f,""" +
        f""""quantT1":$iq1%.3f,"quantTN":$iqN%.3f,"quantPerCopy":${iqN / iq1 / copies}%.3f,""" +
        f""""quantOverFloat":${iqN / ifN}%.3f},""" +
        f""""slack_fold":{"t1":$sf1%.3f,"tN":$sfN%.3f,"perCopy":${sfN / sf1 / copies}%.3f,""" +
        f""""stateRows1":$sr1,"stateRowsN":$srN},""" +
        f""""drift_recall":{"inDist":$recIn%.3f,"shifted":$recShift%.3f},""" +
        f""""churn_recall":{"recallFresh":${chRec(0)}%.3f,""" +
        f""""recallDeleted":${chRec(1)}%.3f,""" +
        f""""recallCompacted":${chRec(2)}%.3f,""" +
        f""""recallRebuilt":${chRec(3)}%.3f,""" +
        f""""serveFresh":${chServe(0)}%.3f,"serveDeleted":${chServe(1)}%.3f,""" +
        f""""serveCompacted":${chServe(2)}%.3f,""" +
        f""""serveRebuilt":${chServe(3)}%.3f,""" +
        s""""cells":[${chCells.map(c =>
          f"""{"seed":${c._1},"nprobe":${c._2},"masked":${c._3}%.3f,""" +
            f""""rebuilt":${c._4}%.3f}""").mkString(",")}],""" +
        f""""maskedMin":${chMasked.min}%.3f,""" +
        f""""maskedMedian":${median(chMasked)}%.3f,""" +
        f""""rebuiltMin":${chRebuilt.min}%.3f,""" +
        f""""rebuiltMedian":${median(chRebuilt)}%.3f,""" +
        f""""freshTarget":$chFresh%.3f,""" +
        s""""recommended":[${chRecCells.map(c =>
          f"""{"seed":${c._1},"nprobe":${c._2},"recall":${c._3}%.3f}""")
          .mkString(",")}],""" +
        f""""recommendedMinRecall":${chRecCells.map(_._3).min}%.3f},""" +
        f""""backup_delta":{"homeBytes":$bkHome,""" +
        f""""steadyCopiedBytes":$bkSteady,"churnCopiedBytes":$bkChurn,""" +
        f""""churnFraction":${bkChurn.toDouble / bkHome}%.4f},""" +
        f""""compact_effect":{"filesFrag":$cfF,"filesCompact":$cfC,""" +
        f""""serveFrag":$ctF%.3f,"serveCompact":$ctC%.3f,""" +
        f""""speedup":${ctF / ctC}%.3f},""" +
        f""""shard_compact":{"bytesMono":$shBm,"bytesSharded":$shBs,""" +
        f""""bytesRatio":${shBs.toDouble / shBm}%.3f,""" +
        f""""wallMono":$shWm%.3f,"wallSharded":$shWs%.3f,""" +
        s""""compactedShards":$shN,"shards":8},""" +
        f""""bm25_matches":{"c1":$bm1,"cN":$bmN,"perCopy":${bmN.toDouble / bm1 / copies}%.3f},""" +
        s""""sentinel":{"runs":[${sentinelTimes.map(t => f"$t%.3f").mkString(",")}],""" +
        f""""spread":$sentinelSpread%.3f,"contended":${sentinelSpread > 1.5}}}"""
    println(json)
    // tracked artifact (VERDICT r7 #3): the driver snapshots
    // PROBE_r{N}.json like BENCH/CORRECTNESS so ratio regressions diff
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { path =>
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }

  /** Copy-i embedding perturbation: cyclic rotation by i positions.
    * Rotation is orthogonal, so norms and within-copy cosines are
    * exactly preserved (both sides of a pair rotate identically) while
    * rotated copies land in unrelated LSH buckets. Factored out so
    * [[EmbedProbe]] replicates embeddings with byte-identical transforms
    * and its findings transfer 1:1 to this full probe. */
  private[graft] def perturbEmbeddings(d: DataFrame, i: Int): DataFrame = {
    val k = i % 64 // testdata dim; rotation by 0 is the identity
    if (k == 0) d
    else d.withColumn("embedding", expr(
      s"concat(slice(embedding, ${k + 1}, 1000000), slice(embedding, 1, $k))"))
  }

  /** Writes the N×-replicated fact tables + untouched dims into `out`.
    * Facts shift only their PRIMARY keys (orderkey / event_id) by a
    * per-copy offset far above the real key range; customer/supplier/
    * part keys are left alone so each copy joins the shared dims exactly
    * as the original does. lineitem shifts l_orderkey by the same offset
    * as orders so the order⋈lineitem join multiplies copy-by-copy.
    *
    * Documents and embeddings need more than a key shift: EXACT copies
    * would be near-dups OF EACH OTHER, so a perfectly linear dedup
    * would still measure quadratic growth purely from the data's
    * replicated duplicate multiplicity (each original spawns C(N, 2)
    * cross-copy pairs). Each copy is therefore deterministically
    * perturbed into its own content namespace, preserving within-copy
    * duplicate structure:
    *  - documents: Caesar-rotate letters by the copy index — token
    *    boundaries and doc shape survive, but copies share no shingles,
    *    so document frequencies don't inflate across copies;
    *  - embeddings: rotate the vector by copy-index positions — norms
    *    and within-copy cosines are exactly preserved (both sides of a
    *    pair rotate identically), while rotated copies land in
    *    unrelated LSH buckets. */
  private[graft] def buildScaled(spark: SparkSession, base: String, out: String,
                                 copies: Int): Unit = {
    // the text perturbation rotates ONE combined 62-character ring
    // (lower + upper + digits): two copies whose rotation offsets
    // differ disagree on EVERY alphanumeric character, so the period —
    // and the copy cap — is 62, not the 10 separate digit rotation
    // allowed (copies 10 apart used to share the digit mapping, and a
    // shingle of consecutive digit-only tokens would silently
    // reintroduce cross-copy duplicate multiplicity). Character CLASS
    // is not preserved (a letter may become a digit in a given copy) —
    // irrelevant to the probed plans, which tokenize on whitespace;
    // only punctuation-and-space-only shingles could ever survive, and
    // the pairwise spec law measures zero leaked shingles on the real
    // corpus. Refuse rather than corrupt the measurement past the cap.
    require(copies >= 1 && copies <= 62,
      s"buildScaled supports 1..62 content-disjoint copies, got $copies")
    val OFF = 1000000000L // > any sf key range
    def rep(df: DataFrame, shifted: Seq[String],
            perturb: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        perturb(shifted.foldLeft(df)(
          (d, c) => d.withColumn(c, col(c) + lit(i * OFF))), i)
      }.reduce(_ union _)

    rep(spark.read.parquet(s"$base/orders.parquet"), Seq("o_orderkey"))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    rep(spark.read.parquet(s"$base/lineitem.parquet"), Seq("l_orderkey"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // events read through the unit-sniffing reader (Tables.events), so the
    // scaled copy is written as native timestamp[us] whatever the source
    // unit — and round-trips through Tables.events on the scaled dir
    rep(graft.sources.Tables.events(spark, base), Seq("event_id"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val ring = alpha + alpha.toUpperCase + "0123456789"
    def rot(s: String, k: Int): String = s.drop(k % s.length) + s.take(k % s.length)
    rep(spark.read.parquet(s"$base/documents.parquet"), Seq("doc_id"),
      (d, i) => d.withColumn("text",
        translate(col("text"), ring, rot(ring, i))))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    rep(spark.read.parquet(s"$base/embeddings.parquet"), Seq("vec_id"),
      perturbEmbeddings)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }
}
