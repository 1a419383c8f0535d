package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Oracle-drift guard: rounds 5 and 6 each shipped one bug of the same
  * class — a threshold/parameter changed on the Spark side (or the
  * oracle side) without its twin, discovered only by the external
  * DuckDB gate after snapshot. This spec closes the loop INSIDE
  * `sbt test`: every oracle whose SQL text Spark itself can parse and
  * execute is run through `spark.sql` at sf0.001 and value-compared
  * against its registered query. Both sides execute on the same engine,
  * so any mismatch is drift in the pair, never dialect noise.
  *
  * Oracles written in DuckDB-only dialect (list_*, quantile_cont,
  * strftime, recursive CTEs, ...) fail Spark analysis and are skipped —
  * those pairs keep bit-identical constants by GENERATING the SQL from
  * the same Scala constants as the plan (see `Extensions`), which is
  * its own drift defense. The skip list is printed so a shrinking
  * covered set is visible in the test report.
  */
class OracleParitySpec extends AnyFunSuite with SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** Oracles Spark can run but that legitimately differ from the
    * registered query's result — name -> reason. Keep EMPTY unless a
    * genuine dialect divergence is documented; an entry here is a hole
    * in the guard. */
  val dialectDivergent: Map[String, String] = Map(
    // q_join_asof* oracles use an inline ASOF-style correlated form that
    // Spark happens to parse but plans as a full correlated subquery per
    // row — excluded for runtime, not semantics, if it ever shows up:
    // (currently they fail Spark analysis, so the map stays empty)
  )

  private def canon(df: DataFrame): Vector[Vector[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(r => Vector.tabulate(r.length)(i =>
        if (r.isNullAt(i)) "<NULL>" else r.get(i).toString))
      .toVector
      // row sort key needs a separator: without one, distinct rows can
      // collide and two equal multisets could sort into different
      // orders — a false mismatch
      .sortBy(_.mkString("\u0001"))
  }

  test("every Spark-runnable oracle value-matches its registered query at sf0.001") {
    Tables.registerViews(spark, dir)
    var covered = 0
    val skipped = Vector.newBuilder[String]
    val failures = Vector.newBuilder[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
         if !dialectDivergent.contains(name)) {
      // ONLY failures AT spark.sql() are skippable — analysis is eager,
      // so dialect mismatch surfaces here (usually AnalysisException,
      // but e.g. DuckDB's regexp_replace 'g' flag dies as a runtime
      // cast error inside analysis-time constant folding, so the catch
      // must stay broad). An oracle that gets PAST spark.sql but fails
      // at collect is a broken pair, not dialect noise — that exception
      // deliberately propagates and fails the test: a catch-all around
      // execution would silently drop pairs from coverage, the exact
      // weakening this guard exists to prevent.
      val oracleDf =
        try Some(spark.sql(sql))
        catch { case _: Exception => skipped += name; None }
      oracleDf.foreach { odf =>
        covered += 1
        val expected = canon(odf)
        val got = canon(SparkEntry.queries(name)(spark, dir))
        if (got != expected) {
          val diff = (got.diff(expected).take(2), expected.diff(got).take(2))
          failures += s"$name: spark=${got.size} rows oracle=${expected.size} " +
            s"rows; spark-only=${diff._1} oracle-only=${diff._2}"
        }
      }
    }
    // result() exactly once: ReusableBuilder forbids anything but
    // clear() after result(), so repeated calls are formally UB that
    // merely happens to work in the current stdlib
    val skippedSet = skipped.result().toSet
    info(s"covered=$covered skipped-as-duckdb-dialect=${skippedSet.size}")
    info(s"skipped: ${skippedSet.mkString(", ")}")
    val fs = failures.result()
    assert(fs.isEmpty, s"oracle drift detected:\n  ${fs.mkString("\n  ")}")
    // the guard must keep covering a meaningful slice of the battery —
    // if a Spark upgrade suddenly rejects ANSI it used to accept, or a
    // refactor renames oracles, this fails rather than silently guarding
    // nothing (q_scalar_subquery, the round-6 escapee, must stay in)
    assert(covered >= 55, s"oracle parity guard only covers $covered oracles")
    // the skip set is PINNED: a covered oracle that silently becomes
    // Spark-unparsable (the hole the broad catch above would otherwise
    // open) fails here by appearing as an unexpected skip. A NEW
    // DuckDB-dialect oracle must be added below deliberately — that edit
    // is the audit trail.
    assert(skippedSet == expectedSkips,
      s"oracle parity skip set drifted; newly skipped (covered oracles " +
        s"that stopped parsing?): ${skippedSet -- expectedSkips}; " +
        s"no longer skipped (remove from expectedSkips): " +
        s"${expectedSkips -- skippedSet}")
  }

  /** Every oracle whose SQL is DuckDB-only dialect (list_*, `//`,
    * quantile_cont, strftime, recursive CTEs, generate_series, ...) —
    * these pairs defend drift by generating their SQL from shared Scala
    * constants instead (see the class doc). */
  val expectedSkips: Set[String] = Set(
    "curation_pipeline", "decontam_bloom", "decontam_ngram", "dedup_clusters",
    // r18: shares dedup_clusters' recursive component CTEs + the
    // curation-quality list_filter score
    "dedup_keep_best",
    // r18: the sharded stream twins share their monolithic gates'
    // dialect-bound oracles (prefixDelOracle / ivfCdcOracle)
    "stream_prefix_sharded_cdc", "stream_ivf_sharded_cdc",
    // r18: '0x'||md5 60-bit permutation draw (the q_split_assign
    // dialect family)
    "q_train_shuffle",
    // r18: '0x'||md5 order + `//` integer division in the copy-count
    // arithmetic (token-budgeted mixture); the epoch composite adds
    // unnest(generate_series) copy explosion
    "q_token_budget_mix", "q_token_budget_temp", "q_epoch_compose",
    // r19: the corpus-release composite chains the recursive cluster
    // CTEs, list_filter quality score, `//` copy-count arithmetic and
    // unnest(generate_series) explosion — every dialect family above
    // in one replay
    "corpus_release_composite",
    // r18: shares retrieval_bm25_incr's dialect-bound bm25Oracle
    "q_index_backup",
    // r18: strlen + `//` per-mille arithmetic (snapshot drift report)
    "q_profile_drift",
    "dedup_containment", "dedup_embedding", "dedup_embedding_incr",
    "dedup_incremental", "dedup_minhash", "dedup_ngram", "dedup_norm",
    "dedup_semantic", "dedup_simhash", "dedup_substring",
    "mm_audio", "mm_binary_meta", "mm_decode", "mm_features",
    "mm_frame_sample", "mm_resize", "mm_video", "q3_shipping_priority", "q_array_fns",
    "q_attribution", "q_bitwise", "q_cdc_latest", "q_datetime_arith",
    "q_domain_mix", "q_explode", "q_explode_outer", "q_filter_scan",
    "q_fuzzy_string", "q_generate_series", "q_group_sample_k",
    "q_hash_sample", "q_heavy_hitters", "q_higher_order", "q_join_asof",
    "q_join_asof_fast",
    "q_json", "q_json_parse", "q_percentile", "q_posexplode", "q_regexp",
    "q_scalar_date", "q_scalar_string", "q_session_window",
    "q_sliding_window", "q_split_assign", "q_split_safe", "q_string_agg",
    "q_synth_source",
    "q_tumbling_window", "q_window_fill", "sim_ann", "sim_ivf", "sim_topk",
    "stream_decontam", "stream_dedup", "stream_embedding_incr",
    "stream_incremental_dedup", "stream_session_window",
    "stream_sliding_window", "stream_static_join", "stream_stream_join",
    "q_weighted_sample", "q_zorder", "sim_quantized",
    "stream_tumbling_window", "text_bpe_merges", "text_bpe_pairs",
    "text_bpe_tokens", "text_chunks",
    "text_familiarity", "text_fingerprint", "text_keyterms", "text_langid",
    "text_ngram_freq",
    "text_pack", "text_pack_shards", "text_quality", "text_quality_quantile",
    "text_redact",
    "text_repetition", "text_rolling_fp", "text_tokens",
    // r11/r12 additions — all generated from shared Scala constants:
    // list_transform/list_sum feature hashing (text_quality_model),
    // LATERAL unnest chunking (dedup_paragraphs), generate_series
    // signature/CMS cell rebuilds (q_corpus_overlap, q_countmin,
    // stream_heavy_hitters), '0x'||md5 threshold draw (q_temperature_mix)
    "q_temperature_mix", "stream_heavy_hitters", "dedup_paragraphs",
    "q_corpus_overlap", "q_countmin", "text_quality_model",
    // r12: shares dedup_incremental's minhash-CTE oracle (dialect-bound
    // for the same reason; generated from the same shared constants)
    "dedup_index_rebuild",
    // r12: shares sim_ivf's unrolled-kmeans CTEs (list_transform/range)
    "q_diversity_sample",
    // r12: shares dedup_embedding_incr's sign-LSH CTE oracle
    "dedup_embedding_rebuild",
    // r13: strftime day-format in the orchestration-gate oracle
    "ref_pipeline_incremental",
    // r13: string_agg(... ORDER BY) statement-text oracle
    "ref_insert_literal",
    // r13: shares sim_ivf's unrolled-kmeans CTE oracle
    "sim_ivf_persisted",
    // r19: the same kmeans CTEs, scoring scan masked to even-label rows
    // (metadata-filtered serving)
    "sim_ivf_filtered",
    // r14: shares text_bm25's integer-div (`//`) oracle — the persisted
    // index folds are exact, stored ≡ fresh replays one oracle text
    "retrieval_bm25_incr",
    // r14: ivfOracle's unrolled-kmeans CTEs + sim_quantized's
    // list_transform codes for the IVF × int8 serving path
    "sim_ivf_quantized",
    // r14: the same kmeans CTEs trained on the base subset for the
    // stored-quantizer append gate and its streaming twin; the rebuilt
    // gate shares sim_ivf's full-corpus kmeans CTEs
    "sim_ivf_appended", "stream_ivf_appended", "sim_ivf_rebuilt",
    // r14: shares retrieval_rrf's dialect-bound oracle (batch-wise
    // serving composes exactly over independent per-query boards)
    "stream_retrieval_rrf",
    // r14: the quantile oracle's unnest([...]) prob list, filtered to
    // the live rows for the deletion-aware gate
    "q_quantile_maintain_del",
    // r15: its CDC streaming twin shares the same dialect-bound text
    "stream_quantile_maintain_del",
    // r15: shares text_bm25's integer-div oracle over corpus − deletes
    "retrieval_bm25_del",
    // r17: the sharded home serves the same net live corpus — shares
    // retrieval_bm25_del's dialect-bound oracle text verbatim; the
    // resharded home rebuilds from live postings to the same corpus
    "retrieval_bm25_sharded", "retrieval_bm25_resharded",
    "retrieval_bm25_upsert",
    // r19: the metadata-filtered serves share the BM25 / RRF
    // dialect-bound texts (tenant leg = the plain oracle over the
    // filtered corpus; home/fused legs add one ids-only join / IN cut)
    "retrieval_bm25_filtered", "retrieval_rrf_filtered",
    "retrieval_bm25_filtered_sharded",
    "text_bpe_stored",
    // r15: ivfOracle's unrolled-kmeans CTEs with a live-rows corpus cut
    "sim_ivf_del",
    // r15: the serving-index CDC twins share the same dialect-bound
    // texts with net-live-corpus cuts
    "stream_bm25_cdc", "stream_ivf_cdc",
    // r17: the sharded stream twin shares stream_bm25_cdc's oracle
    "stream_bm25_sharded_cdc",
    // r15: signature-index takedown gates share the minhash / sign-LSH
    // CTE oracles with live-corpus cuts
    "dedup_incremental_del", "dedup_embedding_del",
    // r17: the sharded sign-LSH home shares the takedown oracle (shard
    // union ≡ monolithic index under one blocking)
    "dedup_embedding_sharded",
    // r15: dedup-index CDC twins share the takedown oracles (the CDC
    // stream nets to the same live corpus by construction)
    "stream_minhash_cdc", "stream_embedding_cdc", "stream_prefix_cdc",
    // r18: the sharded stream twins share the same takedown oracles
    // (one stream entry point, every family × layout cell)
    "stream_minhash_sharded_cdc", "stream_embedding_sharded_cdc",
    // r18: the sharded IVF home under ONE home-level quantizer shares
    // sim_ivf_del's unrolled-kmeans oracle; the sharded prefix home
    // shares the lossless takedown oracle (disjoint shard partition,
    // exact verify)
    "sim_ivf_sharded", "dedup_prefix_sharded",
    // r16: the four-family union embeds the minhash/prefix/bm25/ivf
    // dialect-bound oracle texts with composite live-corpus cuts
    "lifecycle_composite",
    // r13: list_transform/generate_series token CTEs (familiarity family)
    "text_lm_score",
    // r13: unnest([...]) prob list in the shared quantile oracle
    "q_quantile_maintain", "stream_quantile_maintain",
    // r13: `//` integer division + list CTEs in the retrieval family
    // (BM25 micro-unit arithmetic; the RRF oracle embeds both legs)
    "text_index", "text_bm25", "text_bpe_encode", "retrieval_rrf",
    // r13: list_transform micro quantization + LATERAL unnest (PCA)
    "q_pca_gram", "q_pca_project", "q_pca_maintain",
    "stream_pca_maintain",
    // r13: list CTEs + `//` prefix-length arithmetic (lossless simjoin
    // + its persisted-index bipartite/lifecycle forms)
    "q_simjoin_prefix", "dedup_prefix_incr", "dedup_prefix_rebuild",
    "stream_prefix_incr", "dedup_prefix_del",
    // r13: regexp_matches in the constraint-audit oracle
    "q_quality_audit")
}
