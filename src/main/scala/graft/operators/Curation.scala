package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond dedup (SURVEY §2.9 north star):
  * benchmark decontamination — the standard pre-training hygiene pass
  * that removes training documents overlapping an evaluation set at the
  * n-gram level (the GPT-3/Pile/FineWeb recipe).
  */
object Curation {

  /** Documents in `corpus` sharing at least one hashed n-gram shingle
    * with any document in `benchmark`: (doc_id, n_overlap = distinct
    * shared shingles).
    *
    * Scale shape: the benchmark side is an EVAL SUITE — thousands of
    * documents against a 100 TB corpus — so its distinct shingle-hash
    * set is broadcast and the corpus side is one narrow scan + semi-join
    * + partial-aggregating count; the corpus is never shuffled on
    * anything wider than (doc_id, 8-byte hash). Shingles are the same
    * md5-derived 3-gram hashes as the dedup family
    * ([[Dedup.shingleHashesFlat]]), so one signature pass can feed
    * both. */
  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame,
                       id: String, text: String): DataFrame = {
    val c = Dedup.shingleHashesFlat(corpus, id, text)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val b = Dedup.shingleHashesFlat(benchmark, id, text)
      .select(explode(col("hs")).as("h")).distinct()
    c.join(broadcast(b), Seq("h"))
      // hs is distinct per document, so each surviving (doc_id, h) is
      // unique — count(1) == count(DISTINCT h) without the extra
      // distinct aggregation pass
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Builds the `mBits`-bit Bloom bitmap over a `bigint` hash column
    * WITHOUT collecting the hashes: each hash explodes to its k probe
    * positions ([[graft.functions.BloomPositions]]), distinct positions
    * fold into 64-bit words via `bit_or`, and the driver receives at
    * most mBits/64 (word_index, word) rows — the bitmap itself, never
    * the set. Missing words are zero. */
  def buildBloomBitmap(hashes: DataFrame, hashCol: String,
                       mBits: Int, k: Int): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"buildBloomBitmap: mBits must be a power of two >= 64, got $mBits")
    val words = hashes
      .select(explode(graft.functions.exprs
        .bloom_positions(col(hashCol), k, mBits)).as("pos"))
      .distinct()
      .groupBy(shiftright(col("pos"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), pos % 64))").as("bits"))
      .collect()
    val bitmap = new Array[Long](mBits / 64)
    words.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    bitmap
  }

  /** [[contaminatedDocs]] with a Bloom prefilter — the shape that still
    * works when the eval suite is too big to broadcast as an exact hash
    * set: the benchmark shingle set compresses to an mBits-bit bitmap
    * (128 KiB at the default 2^20, independent of benchmark size), the
    * corpus scan drops non-member shingles AT THE SCAN via the codegen'd
    * [[graft.functions.BloomMightContain]], and only the surviving sliver
    * joins the exact benchmark set to kill false positives. The final
    * result is therefore EXACT — identical to [[contaminatedDocs]] for
    * any (mBits, k) — while the corpus-side shuffle carries only true
    * overlaps plus the Bloom's false-positive rate, not every shingle.
    * The confirm join is left unhinted: the candidate stream is tiny, so
    * AQE picks the strategy, and the exact set never needs to fit in
    * executor memory for the plan to hold. */
  def contaminatedDocsBloom(corpus: DataFrame, benchmark: DataFrame,
                            id: String, text: String,
                            mBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val b = Dedup.materialize(
      Dedup.shingleHashesFlat(benchmark, id, text)
        .select(explode(col("hs")).as("h")).distinct())
    confirmedOverlaps(corpus, id, text, b, buildBloomBitmap(b, "h", mBits, k), k)
  }

  /** The confirmed-hit stage of the Bloom plan: (doc_id, h) rows for
    * every DISTINCT corpus shingle that truly occurs in the benchmark
    * set — Bloom prefilter at the scan, exact confirm join. This is the
    * mergeable form: distinct hits from different slices of the same
    * document union correctly (re-aggregate with a distinct count),
    * where pre-aggregated per-doc counts could not — distinct counts
    * don't sum. [[graft.streaming.StreamOps.decontamStream]] persists
    * THESE rows per micro-batch for exactly that reason. */
  private[graft] def confirmedOverlapHits(corpus: DataFrame, id: String,
                                          text: String, bench: DataFrame,
                                          bitmap: Array[Long],
                                          k: Int): DataFrame =
    Dedup.shingleHashesFlat(corpus, id, text)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .filter(graft.functions.exprs
        .bloom_might_contain(col("h"), typedLit(bitmap), k))
      .join(bench, Seq("h"))

  /** The corpus-side half of the Bloom plan — Bloom prefilter at the
    * scan, exact confirm, per-doc overlap count — shared verbatim by
    * [[contaminatedDocsBloom]] (batch) and
    * [[graft.streaming.StreamOps.decontamStream]] (per micro-batch), so
    * the streamed pass cannot drift from the batch semantics. `bench`
    * is the exact distinct benchmark hash set the bitmap was built
    * from. */
  private[graft] def confirmedOverlaps(corpus: DataFrame, id: String,
                                       text: String, bench: DataFrame,
                                       bitmap: Array[Long], k: Int): DataFrame =
    confirmedOverlapHits(corpus, id, text, bench, bitmap, k)
      // hs is distinct per document, so each surviving (doc_id, h) is
      // unique within one corpus frame — count(1) == count(DISTINCT h)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))

  /** Train/val/test assignment that CANNOT leak near-duplicates across
    * splits: the md5-range draw (the `q_split_assign` scheme, 80/10/10)
    * is taken on each document's duplicate-CLUSTER representative — the
    * component-minimum id from [[Dedup.duplicateClusters]], the document
    * itself for singletons — so every member of a near-dup component
    * lands in one split by construction. Hashing per-document instead
    * is the classic eval-contamination bug: a paraphrased copy of a
    * training document ends up in the test split and the held-out loss
    * silently measures memorization.
    *
    * `clusters` is (doc_id, cluster) — duplicate-graph-sized, orders of
    * magnitude smaller than the corpus (it only holds docs with at
    * least one near-dup edge), so the left join broadcasts under AQE;
    * the corpus is scanned once and never shuffled on more than the id.
    * Returns (doc_id, rep, split). */
  def leakageSafeSplit(docs: DataFrame, id: String,
                       clusters: DataFrame): DataFrame =
    docs.select(col(id).cast("long").as("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster")), Seq("doc_id"),
        "left")
      .withColumn("rep", coalesce(col("cluster"), col("doc_id")))
      .withColumn("__h", Dedup.md5Hash32(
        concat(lit("split:"), col("rep").cast("string"))) % 10)
      .select(col("doc_id"), col("rep"),
        when(col("__h") < 8, "train")
          .when(col("__h") < 9, "val")
          .otherwise("test").as("split"))

  /** Quality-aware duplicate-cluster survivor selection — the policy
    * step after near-dup detection: per cluster keep the member with
    * the HIGHEST `scoreCol` (ties break to the smallest id, so the
    * draw is deterministic), not the arbitrary component-minimum the
    * plain canonical rule keeps. The curation pass that discards a
    * well-formatted original because a mangled scrape of it happened
    * to carry the smaller id is throwing away exactly the copy a
    * training run wants.
    *
    * `scored` carries the id and whatever columns the caller wants to
    * survive (the score among them); `clusters` is (doc_id, cluster)
    * from [[Dedup.duplicateClusters]] — duplicate-graph-sized, only
    * docs with at least one near-dup edge. Scale shape: singletons
    * (the overwhelming mass at 100 TB) take the left-anti short path —
    * one scan against the broadcast-sized cluster frame, never
    * shuffled; only cluster MEMBERS shuffle, on the cluster key, into
    * a partial-aggregating `max_by` (each map task forwards one
    * candidate struct per cluster it saw — no per-cluster row
    * explosion crosses the exchange). Scored rows absent from
    * `scored` (e.g. empty-token docs the scorer dropped) simply don't
    * compete; a cluster whose every member was dropped keeps nothing. */
  def keepBest(scored: DataFrame, clusters: DataFrame,
               id: String = "doc_id",
               scoreCol: String = "score"): DataFrame = {
    val cl = clusters.select(col("doc_id").as(id), col("cluster"))
    val payload = struct(scored.columns.map(col): _*)
    val winners = scored.join(cl, Seq(id))
      .groupBy(col("cluster"))
      .agg(max_by(payload, struct(col(scoreCol), col(id) * -1)).as("w"))
      .select(col("w.*"))
    scored.join(cl.select(col(id)), Seq(id), "left_anti")
      .unionByName(winners)
  }
}
