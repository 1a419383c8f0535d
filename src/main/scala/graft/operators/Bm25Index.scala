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
  *  - `df/` — (term, df) PER-BATCH SIGNED PARTIALS. df is a
  *    distributive count over docs (a doc lives in exactly one batch),
  *    so the read-side fold Σ_batches df is the EXACT global df —
  *    unlike the prefix index's deliberately-stale dictionary, BM25's
  *    idf needs current df, and here currency costs a vocab-bounded
  *    fold, never a corpus rescan. [[delete]] writes NEGATIVE partials
  *    into the same table (df is distributive over signed
  *    contributions — the `Maintain.mergeAggStateWithDeletes`
  *    argument), so the fold stays exact under takedowns too;
  *  - `stats/` — (n, s) per-batch signed partials, same fold law
  *    (N = Σ n, S = Σ s) — two driver longs off a ≤ |batches|-row read;
  *  - `tomb/` — (doc_id, shadow_upto) per-batch SHADOW tombstones
  *    written by [[delete]] (`Dedup.ShadowCol`): each kills the doc's
  *    rows from batches ≤ its `shadow_upto` (the marker at delete
  *    time) and spares later batches, so a batched re-insert — or a
  *    delete+insert UPDATE within one CDC batch — serves its new
  *    image. The serving path masks its (already query-term-bounded)
  *    match stream against them; dead postings stay on disk until
  *    [[rebuild]] or [[compact]] folds them away.
  *
  * Because every statistic folds exactly — including the negative
  * delete partials — a served board equals the inline
  * [[TextOps.bm25TopK]] over (base ∪ all committed batches) −
  * committed tombstones BIT FOR BIT, at any append/delete count:
  * "stored ≡ fresh" holds continuously, no rebuild required for
  * correctness. [[rebuild]] is therefore pure compaction hygiene: fold
  * the batch partitions into the base, drop tombstoned postings
  * physically, and reset the tombstone table, so scan cost stops
  * accreting file-open overhead and the tombstone anti-join returns to
  * zero-cost (the `compactMinhashIndex` argument).
  *
  * Crash safety: the initial [[write]] and every [[rebuild]] land via
  * [[Dedup.swapInDir]] (mid-build crash leaves the old state — or
  * nothing — at `dir`; the delete+rename instant is loudly unreadable
  * and repaired by [[Dedup.recoverSwap]]). [[append]]/[[delete]] write
  * their tables non-atomically but the commit marker strictly LAST, so
  * for batchId ≥ 0 calls [[Dedup.committedOnly]] reads exclude a torn
  * call's partitions and a replayed batchId either skips (marker holds
  * it) or dynamically overwrites its own partitions. A batchId=None
  * (synchronous) call writes into the always-committed base partition
  * with NO torn-write protection — it is a one-shot under the
  * single-writer contract, exactly like `appendToMinhashIndex`'s
  * synchronous path; route retried/streamed traffic through batchIds.
  * Appends assume batch doc_ids are not currently LIVE in the index
  * (a live id re-ingested without a delete double-counts df/stats —
  * the same uniqueness contract the minhash index's append carries).
  * A DELETED id may be re-ingested through any batched path: its old
  * rows and stats were retracted at delete time and the shadow
  * tombstone spares the new batch — an update is delete+insert, in
  * one CDC batch or across batches. Only the synchronous
  * (batchId=None) append refuses re-inserts, because its rows land in
  * the always-shadowed base partition ([[Dedup.refuseShadowedInserts]]). */
object Bm25Index {

  private[graft] val Kind = "bm25_index"

  /** Fixed on-disk table schemas, passed EXPLICITLY to every read:
    * parquet schema inference fires a footer-reading Spark job per
    * `spark.read.parquet` call, and the sharded serve
    * ([[ShardedIndex.crossBm25TopKSharded]]) opens 3 tables × S shards
    * — at the S-in-the-hundreds sizing that is hundreds of tiny
    * sequential driver jobs per serve, for schemas that never change
    * (they are this writer's own fixed layout). Explicit schemas make
    * every open job-free; the serve's job count is then provably
    * independent of S (`PlanAuditSpec`). */
  private val postingsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("term",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("tf",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dl",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField(Dedup.IngestBatchCol,
      org.apache.spark.sql.types.LongType)))
  private val dfSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("term",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("df",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField(Dedup.IngestBatchCol,
      org.apache.spark.sql.types.LongType)))
  private val statsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("s",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField(Dedup.IngestBatchCol,
      org.apache.spark.sql.types.LongType)))

  private def readPostings(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(postingsSchema).parquet(s"$root/postings")
  private def readDfTable(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(dfSchema).parquet(s"$root/df")
  private def readStatsTable(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(statsSchema).parquet(s"$root/stats")

  private def validate(meta: Map[String, String], dir: String): Unit =
    require(meta.get("kind").contains(Kind),
      s"$dir is not a BM25 index (kind=${meta.getOrElse("kind", "<absent>")})")

  private def dfPartials(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** Committed shadow tombstones — (doc_id, `Dedup.ShadowCol`) — or
    * None when no delete has ever run (missing `tomb/` = the common
    * append-only case pays zero cost; an empty-born tomb table from an
    * insert-only CDC batch counts as absent). */
  private def committedTombs(spark: SparkSession, dir: String,
                             meta: Map[String, String]): Option[DataFrame] =
    Dedup.committedTombsAt(spark, s"$dir/tomb", meta, "doc_id")

  /** Build the index over `corpus` (one tokenize pass; postings feed
    * the df and stats folds off the same materialized table — the
    * [[TextOps.bm25TopK]] branch-reuse shape, persisted). Lands via a
    * whole-directory swap: writing over an existing index replaces
    * EVERYTHING — stale batch partitions and tombstones from the old
    * index can never ride into the new one. */
  def write(corpus: DataFrame, dir: String, id: String = "doc_id",
            text: String = "text"): Unit = {
    val spark = corpus.sparkSession
    IndexLease.withLease(spark, dir, "Bm25Index.write") {
    val (post, release) = Dedup.materializeTracked(
      TextOps.docTermFreqs(corpus, id, text))
    try {
      Dedup.swapInDir(spark, dir) { tmp =>
        Dedup.writeIndexTable(post, -1L, s"$tmp/postings", overwriteAll = true)
        Dedup.writeIndexTable(dfPartials(post), -1L, s"$tmp/df",
          overwriteAll = true)
        Dedup.writeIndexTable(TextOps.bm25StatsPartials(post), -1L,
          s"$tmp/stats", overwriteAll = true)
        Dedup.writeMeta(spark, tmp, Map("kind" -> Kind))
      }
    } finally release()
    }
  }

  /** Append a batch: its postings, df partials and stats partials land
    * in their own `ingest_batch` partitions; the marker commits all
    * three. Replay-idempotent for batchId ≥ 0 (skip if committed,
    * partition-overwrite if torn); batchId=None is a one-shot with no
    * torn-write protection (see the object doc). */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
             batchId: Option[Long] = None, id: String = "doc_id",
             text: String = "text"): Unit =
    IndexLease.withLease(spark, dir, "Bm25Index.append") {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    if (batchId.exists(_ <= Dedup.lastCommittedBatch(meta))) return
    Dedup.refuseShadowedInserts(newDocs, id,
      committedTombs(spark, root, meta), "doc_id", "Bm25Index.append", dir,
      syncPath = batchId.isEmpty)
    val (post, release) = Dedup.materializeTracked(
      TextOps.docTermFreqs(newDocs, id, text))
    try {
      val part = batchId.getOrElse(-1L)
      Dedup.writeIndexTable(post, part, s"$root/postings")
      Dedup.writeIndexTable(dfPartials(post), part, s"$root/df")
      Dedup.writeIndexTable(TextOps.bm25StatsPartials(post), part,
        s"$root/stats")
      Dedup.writeMeta(spark, root,
        meta ++ batchId.map(b => "last_committed_batch" -> b.toString))
    } finally release()
  }

  /** Delete documents from the index — the takedown /
    * right-to-be-forgotten leg a daily-ingesting corpus needs daily.
    * `tombstones` carries the doc ids to remove (any other columns are
    * ignored; duplicates and ids the index never held are harmless).
    *
    * Mechanics: the retraction is derived FROM THE STORED POSTINGS —
    * the deleted docs' (term, tf, dl) rows are exactly what their
    * ingestion contributed, so writing their df counts and (n, s)
    * stats NEGATED into the same partial tables makes every read-side
    * fold exact over the live corpus (df and (N, S) are distributive
    * over signed contributions — `Maintain.mergeAggStateWithDeletes`
    * applied to retrieval). The ids land in `tomb/` as SHADOW
    * tombstones (`Dedup.ShadowCol` — they kill only rows from batches
    * ≤ the marker at delete time, so a later batched re-insert of the
    * id serves and re-counts); the serving path masks its match
    * stream against them, and postings rows stay on disk until
    * [[rebuild]]/[[compact]] fold them away. The retraction targets
    * only ids the index currently holds LIVE, so a double-delete (or
    * a delete of an unknown id) retracts and tombstones nothing.
    * Cost: one postings semi-join (vocab of the deleted docs) + three
    * batch-bounded writes — never a corpus rescan.
    *
    * Replay contract: identical to [[append]] — batchId ≥ 0 deletes
    * are marker-committed (torn partitions excluded by every read,
    * healed by the replay's partition overwrite; the replay re-derives
    * the SAME retraction because single-writer monotone batchIds mean
    * nothing else committed in between); batchId=None is a
    * synchronous one-shot. */
  def delete(spark: SparkSession, dir: String, tombstones: DataFrame,
             batchId: Option[Long] = None, id: String = "doc_id"): Unit =
    IndexLease.withLease(spark, dir, "Bm25Index.delete") {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    if (batchId.exists(_ <= Dedup.lastCommittedBatch(meta))) return
    val ids = tombstones.select(col(id).cast("long").as("doc_id")).distinct()
    val tombs = committedTombs(spark, root, meta)
    // LIVE postings only: a re-deleted id's earlier (already-shadowed,
    // already-retracted) postings must not retract again
    val livePost = Dedup.maskShadowed(
      Dedup.committedOnly(readPostings(spark, root), meta),
      "doc_id", tombs, "doc_id")
      .select("doc_id", "term", "tf", "dl")
    // materialized: the fresh-ids plan reads tomb/ (via the mask),
    // which the write below appends to — the retraction reuses it
    val (fresh, relT) = Dedup.materializeTracked(
      Dedup.liveAmong(ids, "doc_id", livePost, "doc_id"))
    try {
      val (delPost, relP) = Dedup.materializeTracked(
        livePost.join(fresh, Seq("doc_id"), "left_semi"))
      try {
        val part = batchId.getOrElse(-1L)
        Dedup.writeTombs(fresh, Dedup.lastCommittedBatch(meta), part,
          s"$root/tomb")
        Dedup.writeIndexTable(
          dfPartials(delPost).select(col("term"), (-col("df")).as("df")),
          part, s"$root/df")
        Dedup.writeIndexTable(
          TextOps.bm25StatsPartials(delPost)
            .select((-col("n")).as("n"), (-col("s")).as("s")),
          part, s"$root/stats")
        Dedup.writeMeta(spark, root,
          meta ++ batchId.map(b => "last_committed_batch" -> b.toString))
      } finally relP()
    } finally relT()
  }

  /** One CDC change-batch applied atomically under ONE commit marker —
    * the per-trigger body of
    * [[graft.streaming.StreamOps.maintainBm25CdcStream]]. [[append]]
    * then [[delete]] with the same batchId cannot compose (the first
    * commits the marker, the second would skip), and two
    * partition-overwrite writes into the same `ingest_batch` would
    * clobber each other — so the combined op writes the batch's insert
    * postings, its SIGNED df/(N,S) partials (insert positives ∪ delete
    * negatives in one table write each), and its tombstones into one
    * partition, marker strictly last. Deletes apply FIRST, to the
    * PRE-batch state (the shadow tombstone's `shadow_upto` is the
    * pre-batch marker, so it kills no row of this batch): a
    * delete+insert of one id in the batch is an UPDATE — the old
    * image's stats retract, the new image indexes and counts — and a
    * re-insert of an id deleted in an earlier batch serves the same
    * way, no rebuild required. Inserting a currently-live id WITHOUT
    * deleting it in the same batch remains the double-count
    * caller-contract violation it always was. */
  def applyCdc(spark: SparkSession, dir: String, newDocs: DataFrame,
               tombstones: DataFrame, batchId: Long,
               id: String = "doc_id", text: String = "text"): Unit =
    IndexLease.withLease(spark, dir, "Bm25Index.applyCdc") {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    if (batchId <= Dedup.lastCommittedBatch(meta)) return
    val ids = tombstones.select(col(id).cast("long").as("doc_id")).distinct()
    val priorTombs = committedTombs(spark, root, meta)
    Dedup.refuseShadowedInserts(newDocs, id, priorTombs, "doc_id",
      "Bm25Index.applyCdc", dir, syncPath = false)
    // LIVE pre-batch postings: the retraction must see exactly what
    // this batch's tombstones newly kill, never already-shadowed rows
    val livePost = Dedup.maskShadowed(
      Dedup.committedOnly(readPostings(spark, root), meta),
      "doc_id", priorTombs, "doc_id")
      .select("doc_id", "term", "tf", "dl")
    val (fresh, relT) = Dedup.materializeTracked(
      Dedup.liveAmong(ids, "doc_id", livePost, "doc_id"))
    try {
      // deletes-first: ALL inserts index (an update's new image too)
      val (post, relI) = Dedup.materializeTracked(
        TextOps.docTermFreqs(newDocs, id, text))
      val (delPost, relD) = Dedup.materializeTracked(
        livePost.join(fresh, Seq("doc_id"), "left_semi"))
      try {
        Dedup.writeIndexTable(post, batchId, s"$root/postings")
        Dedup.writeTombs(fresh, Dedup.lastCommittedBatch(meta), batchId,
          s"$root/tomb")
        Dedup.writeIndexTable(
          dfPartials(post).unionByName(
            dfPartials(delPost).select(col("term"), (-col("df")).as("df"))),
          batchId, s"$root/df")
        Dedup.writeIndexTable(
          TextOps.bm25StatsPartials(post).unionByName(
            TextOps.bm25StatsPartials(delPost)
              .select((-col("n")).as("n"), (-col("s")).as("s"))),
          batchId, s"$root/stats")
        Dedup.writeMeta(spark, root,
          meta + ("last_committed_batch" -> batchId.toString))
      } finally { relI(); relD() }
    } finally relT()
  }

  /** Folds a CDC/append-fed index's per-batch partitions back into
    * `targetFiles` files per table — the retrieval twin of
    * `Dedup.compactMinhashIndex`: at micro-batch cadence postings, the
    * signed df/(N,S) partials, and the tombstones fragment one file
    * set per batch, the classic streaming-sink killer. Committed rows
    * are preserved EXACTLY (the signed partials keep folding to the
    * same totals), so a readable mix of compacted and uncompacted
    * TABLES is content-identical and the per-table swap sequence is
    * safe here — unlike [[rebuild]], whose content changes and
    * therefore swaps one directory. `last_committed_batch` survives in
    * the metadata: folded batches live on in the base partition, so
    * replayed batchIds still skip. Tombstoned postings are folded away
    * physically and the tombstone table dropped (squashing batches
    * into the base would erase the shadow ordering — see
    * `Dedup.compactTables`); the signed df/(N,S) partials fold
    * verbatim, so every read-side total is unchanged. Offline
    * single-writer maintenance. */
  def compact(spark: SparkSession, dir: String,
              targetFiles: Int = 4): Unit =
    IndexLease.withLease(spark, dir, "Bm25Index.compact") {
      validate(Dedup.readMeta(spark, Dedup.indexRoot(spark, dir)), dir)
      Dedup.compactTables(spark, dir, targetFiles,
        masked = Seq("postings" -> Seq("doc_id", "term", "tf", "dl")),
        idCol = "doc_id",
        unmasked = Seq("df" -> Seq("term", "df"),
          "stats" -> Seq("n", "s")))
    }

  /** Exact global document frequencies: Σ over committed batch
    * partials (appends positive, deletes negative), vocab-bounded.
    * Terms whose docs are all deleted fold to 0 and drop — exactly as
    * a fresh build over the live corpus would never emit them. */
  def foldedDf(spark: SparkSession, dir: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    Dedup.committedOnly(readDfTable(spark, root), meta)
      .groupBy("term").agg(sum(col("df")).as("df"))
      .filter(col("df") > 0)
  }

  /** Exact global (N, S): Σ over committed per-batch signed stat
    * rows. */
  def foldedStats(spark: SparkSession, dir: String): (Long, Long) = {
    val (n, s) = foldedStatsTolerant(spark, dir)
    require(n > 0, s"BM25 index at $dir holds no committed documents")
    (n, s)
  }

  /** [[foldedStats]] tolerating a zero-doc state — the per-shard leg of
    * the sharded fold ([[ShardedIndex.crossBm25TopKSharded]]), where a
    * takedown may empty ONE shard while the global index stays live;
    * the n > 0 refusal belongs to whoever owns the global total. */
  private[graft] def foldedStatsTolerant(spark: SparkSession,
                                         dir: String): (Long, Long) = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    val r = Dedup.committedOnly(readStatsTable(spark, root), meta)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s")).head()
    // an empty-corpus write lands one (n=0, s=NULL) partial — both
    // folds null-coalesce so "zero docs" reads as (0, 0) here and the
    // caller owns the refusal
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** The committed signed (n, s) stat partials of the index at `dir`
    * as a LAZY frame — the per-shard leg of the sharded serve's
    * one-action global fold: [[ShardedIndex.crossBm25TopKSharded]]
    * unions S of these and aggregates ONCE, instead of S sequential
    * per-shard [[foldedStatsTolerant]] `.head()` jobs — at the
    * S-in-the-hundreds sizing `docs/SCALING.md` recommends, the
    * difference between one Spark job and hundreds of serve-latency
    * driver round trips. (Per-shard metadata reads remain — driver-side
    * filesystem property loads, not Spark jobs.) */
  private[graft] def statsFrame(spark: SparkSession, dir: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    Dedup.committedOnly(readStatsTable(spark, root), meta)
      .select("n", "s")
  }

  /** The committed signed df partials of the index at `dir`, RAW
    * (un-aggregated) and lazy — the df twin of [[statsFrame]]: the
    * sharded serve unions S of these and runs ONE global
    * `groupBy(term).sum`, instead of per-shard [[foldedDf]] aggregates
    * whose S shuffle stages each materialize as their own AQE job
    * (df is distributive, so one fold over all partials ≡ the fold of
    * per-shard folds; the df > 0 drop applies to the global sum). */
  private[graft] def dfPartialsFrame(spark: SparkSession,
                                     dir: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    Dedup.committedOnly(readDfTable(spark, root), meta)
      .select("term", "df")
  }

  /** The committed LIVE postings rows matching `probedKeys` (a
    * broadcast-sized distinct-term frame): the query-term-bounded match
    * stream both the single-directory serve ([[crossBm25TopK]]) and the
    * sharded serve's per-shard legs read — semi-join to the probed
    * terms FIRST (partition-pruned committed scan), then the
    * tombstone shadow mask over the already-bounded stream. */
  private[graft] def liveTermBoundedPostings(spark: SparkSession,
                                             dir: String,
                                             probedKeys: DataFrame): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    val matched = Dedup.committedOnly(
      readPostings(spark, root), meta)
      .join(probedKeys, Seq("term"), "left_semi")
    Dedup.maskShadowed(matched, "doc_id",
      committedTombs(spark, root, meta), "doc_id")
      .select("doc_id", "term", "tf", "dl")
  }

  /** Serve a query batch from the stored index: top-k per query,
    * bit-identical to [[TextOps.bm25TopK]] over the index's full
    * committed LIVE content (appends minus tombstoned docs). The
    * corpus-side postings scan reduces to the batch's own distinct
    * query terms (broadcast semi-join — the query batch is the
    * per-trigger unit, batch-bounded by contract, never
    * corpus-derived; the `crossPrefixJoin` probed-keys shape), then
    * the match stream anti-joins the committed tombstones — the
    * anti-join's probe side is the already-term-bounded match stream,
    * so deletes cost one scan of the (single-column) tombstone table
    * per serve, reclaimed by [[rebuild]]. Serving cost is Σ_q Σ_t
    * df(t) — the match stream — plus a vocab-bounded df fold,
    * independent of how many batches the index accreted. `maxDfFrac`
    * is the same serving-path pruning knob as the inline form (a
    * semantics change, caller-owned). */
  def crossBm25TopK(spark: SparkSession, queries: DataFrame, dir: String,
                    k: Int = 5, qid: String = "query_id",
                    qtext: String = "query_text",
                    maxDfFrac: Double = 1.0): DataFrame = {
    require(k > 0, s"crossBm25TopK: k must be positive, got $k")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"crossBm25TopK: maxDfFrac must be in (0, 1], got $maxDfFrac")
    val (nDocs, sTok) = foldedStats(spark, dir)
    val kept = TextOps.bm25KeptTerms(foldedDf(spark, dir), nDocs, maxDfFrac)
    val qterms = TextOps.bm25QueryTerms(queries, qid, qtext)
    val probedKeys = broadcast(qterms.select("term").distinct())
    val post = liveTermBoundedPostings(spark, dir, probedKeys)
    val scored = post
      .join(kept, Seq("term"))
      .join(qterms, Seq("term"))
      .transform(TextOps.withBm25Score(nDocs, sTok))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__sc")).as("score_micro"))
    TextOps.bm25Board(scored, k)
  }

  /** Statistics scope for [[crossBm25TopKFiltered]] — the ONE real
    * semantic fork in filtered lexical retrieval, so it is a typed
    * knob, never a silent default. */
  sealed trait FilterScope
  /** df/N/S recomputed over the FILTERED live corpus: the board a
    * dedicated per-tenant index would serve (idf reflects the corpus
    * the caller can actually retrieve from). Serving pays one
    * df/stats fold over the allowed docs' postings — ∝ the FILTER's
    * corpus, never the home. */
  case object FilteredStats extends FilterScope
  /** Home-level df/N/S with only the match stream masked — the
    * Lucene/Elasticsearch `filter` convention (idf is an index-wide
    * constant, so the same doc scores identically under every
    * filter). Serving cost is [[crossBm25TopK]]'s match stream plus
    * an ids-only semi-join. */
  case object HomeStats extends FilterScope

  /** Metadata-FILTERED serving over the stored index — "top-k
    * matching WHERE <predicate>", the lexical twin of
    * [[Similarity.ivfTopKFiltered]] (tenant / language / license /
    * date filters on the retrieval corpus). The predicate arrives as
    * `allowed`: a (`doc_id`) key set computed from ANY metadata table
    * by ordinary pushed-down Spark filters — the index stays
    * metadata-free, so ONE stored home serves every filter with no
    * per-filter builds.
    *
    * Semantics are PRE-filter in both scopes (k survivors come back
    * whenever the live index holds k allowed matches — never a
    * post-hoc cut of an unfiltered board); the scopes differ only in
    * where idf/length-normalization statistics come from:
    *
    *  - [[FilteredStats]] (default): bit-identical to
    *    [[TextOps.bm25TopK]] over the filtered live corpus — the
    *    exactness law a per-tenant index would give, by the same
    *    distributivity argument [[writeFromPostings]] rests on
    *    (df/N/S recompute exactly from any live-postings slice).
    *  - [[HomeStats]]: bit-identical to [[crossBm25TopK]]'s match
    *    stream restricted to allowed docs — every surviving (query,
    *    doc) pair keeps its unfiltered score.
    *
    * Scale shape: the allowed keys are ids-only (no text payload) —
    * selective filters broadcast into the semi-join; HomeStats adds
    * nothing else to the serve. FilteredStats additionally folds
    * df/(N, S) over the allowed docs' postings — one scan bounded by
    * the filtered corpus (a tenant's postings, not the home's), the
    * honest price of tenant-local idf. */
  def crossBm25TopKFiltered(spark: SparkSession, queries: DataFrame,
                            dir: String, allowed: DataFrame, k: Int = 5,
                            qid: String = "query_id",
                            qtext: String = "query_text",
                            maxDfFrac: Double = 1.0,
                            scope: FilterScope = FilteredStats): DataFrame = {
    require(k > 0, s"crossBm25TopKFiltered: k must be positive, got $k")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"crossBm25TopKFiltered: maxDfFrac must be in (0, 1], got $maxDfFrac")
    val allowedKeys = allowedDocKeys(allowed, "crossBm25TopKFiltered")
    val qterms = TextOps.bm25QueryTerms(queries, qid, qtext)
    scope match {
      case HomeStats =>
        val (nDocs, sTok) = foldedStats(spark, dir)
        val kept = TextOps.bm25KeptTerms(foldedDf(spark, dir), nDocs,
          maxDfFrac)
        val probedKeys = broadcast(qterms.select("term").distinct())
        val scored = liveTermBoundedPostings(spark, dir, probedKeys)
          .join(allowedKeys, Seq("doc_id"), "left_semi")
          .join(kept, Seq("term"))
          .join(qterms, Seq("term"))
          .transform(TextOps.withBm25Score(nDocs, sTok))
          .groupBy("query_id", "doc_id")
          .agg(sum(col("__sc")).as("score_micro"))
        TextOps.bm25Board(scored, k)
      case FilteredStats =>
        tenantBoard(
          livePostings(spark, dir)
            .join(allowedKeys, Seq("doc_id"), "left_semi"),
          qterms, k, maxDfFrac,
          s"crossBm25TopKFiltered: the filter excludes every live " +
            s"document of $dir")
    }
  }

  /** The `allowed` key-set shape contract shared by every filtered
    * serve: exactly one `doc_id` column of an INTEGRAL type, cast to
    * the postings' key type. Non-integral key sets (string/UUID ids)
    * are refused loudly — a silent cast would turn every key to NULL,
    * drop every row, and serve an empty/misleading board. The returned
    * frame carries an explicit broadcast hint: the ids-only contract
    * IS the broadcast-sized contract, and relying on AQE size
    * estimation instead lets a poorly-estimated key set silently add a
    * corpus-keyed shuffle of the match stream in deployment (the exact
    * regression `PlanAuditSpec`'s no-extra-exchange pin documents, but
    * that pin only runs at fixture scale). */
  private[operators] def allowedDocKeys(allowed: DataFrame,
                                        what: String): DataFrame = {
    val cols = allowed.columns.toSeq
    require(cols == Seq("doc_id"),
      s"$what: `allowed` must be a single doc_id key " +
        s"column (got ${cols.mkString(", ")}) — compute it by filtering " +
        "any metadata table and selecting the id")
    val dt = allowed.schema("doc_id").dataType
    val integral = dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral,
      s"$what: `allowed` doc_id must be an integral key (got $dt) — " +
        "a non-numeric key set would cast to NULL and silently exclude " +
        "every document")
    broadcast(allowed.select(col("doc_id").cast("long").as("doc_id")))
  }

  /** [[FilteredStats]]-scope board off an ALREADY-FILTERED live
    * postings slice — the per-tenant-index arithmetic shared by the
    * monolithic and sharded filtered serves (a sharded home's live
    * postings union IS the monolithic home's, so sharding stays an
    * operational knob under filters too). PERSISTS (never checkpoints)
    * the slice: the stats fold's eager head() computes it once, then
    * the df fold and the match scan read the cached blocks — never the
    * home's full postings twice. A reliable checkpoint here would leak
    * one on-disk copy of the tenant slice per serve call (checkpoint
    * files are not reclaimed without `cleanCheckpoints`, and this is a
    * per-query-batch SERVING path, unlike the one-shot build/probe
    * callers of `materializeTracked`); persisted blocks are instead
    * reclaimed by the ContextCleaner once the served board frame goes
    * unreachable. */
  private[operators] def tenantBoard(post0: DataFrame, qterms: DataFrame,
                                     k: Int, maxDfFrac: Double,
                                     emptyMsg: String): DataFrame = {
    val post = post0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = TextOps.bm25StatsPartials(post).head()
    val nDocs = stats.getLong(0)
    require(nDocs > 0,
      s"$emptyMsg — an empty tenant corpus has no idf; " +
        "widen the filter or serve HomeStats over an empty board")
    val sTok = stats.getLong(1)
    val dft = post.groupBy("term").agg(count(lit(1)).as("df"))
    val kept = TextOps.bm25KeptTerms(dft, nDocs, maxDfFrac)
    val scored = post
      .join(kept, Seq("term"))
      .join(qterms, Seq("term"))
      .transform(TextOps.withBm25Score(nDocs, sTok))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__sc")).as("score_micro"))
    TextOps.bm25Board(scored, k)
  }

  /** The FULL committed live postings of the index — (doc_id, term,
    * tf, dl), tombstones masked. The corpus-equivalent artifact a
    * whole-index rewrite (rebuild, re-shard) works from: df and (N, S)
    * recompute from it exactly, so an index written from these rows
    * serves bit-identically without the original text. */
  private[graft] def livePostings(spark: SparkSession,
                                  dir: String): DataFrame = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    Dedup.maskShadowed(
      Dedup.committedOnly(readPostings(spark, root), meta),
      "doc_id", committedTombs(spark, root, meta), "doc_id")
      .select("doc_id", "term", "tf", "dl")
  }

  /** [[write]] from an already-tokenized postings frame — the
    * re-shard writer: a sharded home's new shards are built from LIVE
    * postings slices (the original text is not stored), with df and
    * (N, S) re-derived per slice, exact by distributivity. */
  private[graft] def writeFromPostings(post: DataFrame, dir: String): Unit = {
    val spark = post.sparkSession
    IndexLease.withLease(spark, dir, "Bm25Index.writeFromPostings") {
      val (p, release) = Dedup.materializeTracked(post)
      try {
        Dedup.swapInDir(spark, dir) { tmp =>
          Dedup.writeIndexTable(p, -1L, s"$tmp/postings",
            overwriteAll = true)
          Dedup.writeIndexTable(dfPartials(p), -1L, s"$tmp/df",
            overwriteAll = true)
          Dedup.writeIndexTable(TextOps.bm25StatsPartials(p), -1L,
            s"$tmp/stats", overwriteAll = true)
          Dedup.writeMeta(spark, tmp, Map("kind" -> Kind))
        }
      } finally release()
    }
  }

  /** Recomputes df and (N, S) from the LIVE postings (committed minus
    * tombstoned) and diffs them against the folded signed partials —
    * the [[graft.operators.IndexAudit]] cross-check that makes a torn
    * synchronous delete DETECTABLE: a batchId=None [[delete]] performs
    * three non-atomic writes (tomb, negative df, negative stats), and a
    * crash mid-call leaves a doc masked while its statistics still
    * count (or df retracted but N/S not) — skew no marker can diagnose,
    * because the base partition is always committed. Under any
    * crash-free history the partials fold EXACTLY to the live
    * recompute, so any nonzero diff here is that torn write (or a
    * second writer). Costs one full postings scan — the audit's
    * countChecks tier, not the metadata tier. Returns
    * (mismatched df terms, N diff, S diff); all-zero = consistent. */
  private[graft] def statsConsistency(spark: SparkSession,
                                      dir: String): (Long, Long, Long) = {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    val committed = Dedup.committedOnly(
      readPostings(spark, root), meta)
    val live = Dedup.maskShadowed(committed, "doc_id",
      committedTombs(spark, root, meta), "doc_id")
      .select("doc_id", "term", "tf", "dl")
    val dfMismatch = dfPartials(live).withColumnRenamed("df", "df_live")
      .join(foldedDf(spark, dir).withColumnRenamed("df", "df_fold"),
        Seq("term"), "full_outer")
      .filter(coalesce(col("df_live"), lit(0L)) =!=
        coalesce(col("df_fold"), lit(0L)))
      .count()
    val liveStats = TextOps.bm25StatsPartials(live)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("s")), lit(0L)).as("s")).head()
    val (nFold, sFold) = foldedStats(spark, dir)
    (dfMismatch, liveStats.getLong(0) - nFold, liveStats.getLong(1) - sFold)
  }

  /** Compaction hygiene (NOT a correctness op — the folds are already
    * exact): fold every committed batch's LIVE postings (appends minus
    * tombstoned docs) into the base partition, re-derive df/stats from
    * them, drop the tombstone table, and swap the WHOLE directory in
    * one rename ([[Dedup.swapInDir]] — a per-table sequence would have
    * readable-but-mixed crash windows; the directory swap's only crash
    * window is loudly unreadable and [[Dedup.recoverSwap]]-repairable).
    * Metadata (including the commit marker) survives, so a replayed
    * batch ≤ marker still skips — appended rows live on in the base
    * and deleted rows are now physically gone. */
  def rebuild(spark: SparkSession, dir: String, targetFiles: Int = 4): Unit =
    IndexLease.withLease(spark, dir, "Bm25Index.rebuild") {
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    validate(meta, dir)
    val committed = Dedup.committedOnly(
      readPostings(spark, root), meta)
    val live = Dedup.maskShadowed(committed, "doc_id",
      committedTombs(spark, root, meta), "doc_id")
      .select("doc_id", "term", "tf", "dl")
    val (post, release) = Dedup.materializeTracked(live)
    try {
      // an all-deleted corpus would rebuild to empty-born tables that
      // no reader can open — refuse with the honest instruction instead
      require(post.head(1).nonEmpty,
        s"Bm25Index.rebuild: every document in $dir is deleted — " +
          "nothing to rebuild; delete the index directory instead")
      Dedup.swapInDir(spark, dir) { tmp =>
        Dedup.writeIndexTable(post.coalesce(targetFiles), -1L,
          s"$tmp/postings", overwriteAll = true)
        Dedup.writeIndexTable(dfPartials(post).coalesce(targetFiles), -1L,
          s"$tmp/df", overwriteAll = true)
        Dedup.writeIndexTable(TextOps.bm25StatsPartials(post), -1L,
          s"$tmp/stats", overwriteAll = true)
        Dedup.writeMeta(spark, tmp, meta)
      }
    } finally release()
  }
}
