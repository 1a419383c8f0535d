package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 retrieval index — the serving-side artifact for a
  * continuously-fed retrieval corpus. [[TextOps.bm25TopK]] re-derives
  * postings, document frequencies and the (N, S) corpus stats on every
  * invocation; at 100 TB that is a full corpus re-tokenize per query
  * batch. This index pays the postings build ONCE, then every serving
  * call reads a query-term-bounded sliver of the stored postings — the
  * `crossPrefixJoin` lifecycle shape ([[SimJoin]]) applied to
  * retrieval.
  *
  * Layout under `dir` (the shared v2 `ingest_batch`-partitioned index
  * layout — [[Dedup.writeIndexTable]] / commit-marker semantics):
  *
  *  - `postings/` — (doc_id, term, tf, dl): the per-(doc, term) table
  *    from [[TextOps.docTermFreqs]], one partition per appended batch;
  *  - `df/` — (term, df) PER-BATCH PARTIALS. df is a distributive
  *    count over docs (a doc lives in exactly one batch), so the
  *    read-side fold Σ_batches df is the EXACT global df — unlike the
  *    prefix index's deliberately-stale dictionary, BM25's idf needs
  *    current df, and here currency costs a vocab-bounded fold, never
  *    a corpus rescan;
  *  - `stats/` — (n, s) per-batch partials, same fold law (N = Σ n,
  *    S = Σ s) — two driver longs off a ≤ |batches|-row read.
  *
  * Because every statistic folds exactly, a served board equals the
  * inline [[TextOps.bm25TopK]] over base ∪ all committed batches BIT
  * FOR BIT, at any append count — "stored ≡ fresh" holds continuously,
  * no rebuild required for correctness. [[rebuild]] is therefore pure
  * compaction hygiene: fold the batch partitions into the base so scan
  * cost stops accreting file-open overhead (the `compactMinhashIndex`
  * argument).
  *
  * Crash safety: the three table writes per append are non-atomic, but
  * the commit marker is written strictly AFTER all three —
  * [[Dedup.committedOnly]] reads exclude a torn append's partitions,
  * and a replayed batchId either skips (marker holds it) or dynamically
  * overwrites its own partitions. Single-writer contract as all v2
  * indexes. Appends assume batch doc_ids are NEW (an id re-ingested in
  * a later batch would double-count df/stats — the same uniqueness
  * contract the minhash index's append carries). */
object Bm25Index {

  private val Kind = "bm25_index"

  private def validate(meta: Map[String, String], dir: String): Unit =
    require(meta.get("kind").contains(Kind),
      s"$dir is not a BM25 index (kind=${meta.getOrElse("kind", "<absent>")})")

  private def dfPartials(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** Build the index over `corpus` (one tokenize pass; postings feed
    * the df and stats folds off the same materialized table — the
    * [[TextOps.bm25TopK]] branch-reuse shape, persisted). */
  def write(corpus: DataFrame, dir: String, id: String = "doc_id",
            text: String = "text"): Unit = {
    val (post, release) = Dedup.materializeTracked(
      TextOps.docTermFreqs(corpus, id, text))
    try {
      Dedup.writeIndexTable(post, -1L, s"$dir/postings", overwriteAll = true)
      Dedup.writeIndexTable(dfPartials(post), -1L, s"$dir/df",
        overwriteAll = true)
      Dedup.writeIndexTable(TextOps.bm25StatsPartials(post), -1L,
        s"$dir/stats", overwriteAll = true)
      Dedup.writeMeta(corpus.sparkSession, dir, Map("kind" -> Kind))
    } finally release()
  }

  /** Append a batch: its postings, df partials and stats partials land
    * in their own `ingest_batch` partitions; the marker commits all
    * three. Replay-idempotent (skip if committed, partition-overwrite
    * if torn). */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
             batchId: Option[Long] = None, id: String = "doc_id",
             text: String = "text"): Unit = {
    val meta = Dedup.readMeta(spark, dir)
    validate(meta, dir)
    if (batchId.exists(_ <= Dedup.lastCommittedBatch(meta))) return
    val (post, release) = Dedup.materializeTracked(
      TextOps.docTermFreqs(newDocs, id, text))
    try {
      val part = batchId.getOrElse(-1L)
      Dedup.writeIndexTable(post, part, s"$dir/postings")
      Dedup.writeIndexTable(dfPartials(post), part, s"$dir/df")
      Dedup.writeIndexTable(TextOps.bm25StatsPartials(post), part,
        s"$dir/stats")
      Dedup.writeMeta(spark, dir,
        meta ++ batchId.map(b => "last_committed_batch" -> b.toString))
    } finally release()
  }

  /** Exact global document frequencies: Σ over committed batch
    * partials, vocab-bounded. */
  def foldedDf(spark: SparkSession, dir: String): DataFrame = {
    val meta = Dedup.readMeta(spark, dir)
    validate(meta, dir)
    Dedup.committedOnly(spark.read.parquet(s"$dir/df"), meta)
      .groupBy("term").agg(sum(col("df")).as("df"))
  }

  /** Exact global (N, S): Σ over committed per-batch stat rows. */
  def foldedStats(spark: SparkSession, dir: String): (Long, Long) = {
    val meta = Dedup.readMeta(spark, dir)
    validate(meta, dir)
    val r = Dedup.committedOnly(spark.read.parquet(s"$dir/stats"), meta)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s")).head()
    require(!r.isNullAt(0) && r.getLong(0) > 0,
      s"BM25 index at $dir holds no committed documents")
    (r.getLong(0), r.getLong(1))
  }

  /** Serve a query batch from the stored index: top-k per query,
    * bit-identical to [[TextOps.bm25TopK]] over the index's full
    * committed content. The corpus-side postings scan reduces to the
    * batch's own distinct query terms (broadcast semi-join — the
    * query batch is the per-trigger unit, batch-bounded by contract,
    * never corpus-derived; the `crossPrefixJoin` probed-keys shape),
    * so serving cost is Σ_q Σ_t df(t) — the match stream — plus a
    * vocab-bounded df fold, independent of how many batches the index
    * accreted. `maxDfFrac` is the same serving-path pruning knob as
    * the inline form (a semantics change, caller-owned). */
  def crossBm25TopK(spark: SparkSession, queries: DataFrame, dir: String,
                    k: Int = 5, qid: String = "query_id",
                    qtext: String = "query_text",
                    maxDfFrac: Double = 1.0): DataFrame = {
    require(k > 0, s"crossBm25TopK: k must be positive, got $k")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"crossBm25TopK: maxDfFrac must be in (0, 1], got $maxDfFrac")
    val meta = Dedup.readMeta(spark, dir)
    validate(meta, dir)
    val (nDocs, sTok) = foldedStats(spark, dir)
    val kept = TextOps.bm25KeptTerms(foldedDf(spark, dir), nDocs, maxDfFrac)
    val qterms = TextOps.bm25QueryTerms(queries, qid, qtext)
    val probedKeys = broadcast(qterms.select("term").distinct())
    val post = Dedup.committedOnly(
      spark.read.parquet(s"$dir/postings"), meta)
      .select("doc_id", "term", "tf", "dl")
      .join(probedKeys, Seq("term"), "left_semi")
    val scored = post
      .join(kept, Seq("term"))
      .join(qterms, Seq("term"))
      .transform(TextOps.withBm25Score(nDocs, sTok))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__sc")).as("score_micro"))
    TextOps.bm25Board(scored, k)
  }

  /** Compaction hygiene (NOT a correctness op — the folds are already
    * exact): fold every committed batch's postings into the base
    * partition, re-derive df/stats from them, swap all three tables.
    * Metadata (including the commit marker) survives, so a replayed
    * batch ≤ marker still skips — its rows live on in the base. */
  def rebuild(spark: SparkSession, dir: String, targetFiles: Int = 4): Unit = {
    val meta = Dedup.readMeta(spark, dir)
    validate(meta, dir)
    val (post, release) = Dedup.materializeTracked(
      Dedup.committedOnly(spark.read.parquet(s"$dir/postings"), meta)
        .select("doc_id", "term", "tf", "dl"))
    try {
      Dedup.swapInTable(spark, s"$dir/postings", post.coalesce(targetFiles))
      Dedup.swapInTable(spark, s"$dir/df",
        dfPartials(post).coalesce(targetFiles))
      Dedup.swapInTable(spark, s"$dir/stats", TextOps.bm25StatsPartials(post))
    } finally release()
  }
}
