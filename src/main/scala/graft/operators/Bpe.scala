package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction — the tokenizer-training leg of
  * a corpus pipeline: learn the merge table from corpus statistics, at
  * corpus scale, without ever holding more than one (pair, count) row
  * stream and a bounded model on the driver.
  *
  * The classic algorithm (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") iterates: count
  * adjacent symbol pairs over all word segmentations, merge the most
  * frequent pair everywhere, repeat. The scale shape is what matters
  * here:
  *
  *   - Pair statistics aggregate over DISTINCT words weighted by corpus
  *     frequency — one shuffle over the vocabulary (≤ ~10⁷ rows for
  *     web-scale corpora), never over the corpus. The corpus is
  *     touched ONCE (the word-frequency count); every merge iteration
  *     after that runs on the vocabulary table.
  *   - Each iteration moves exactly ONE row to the driver (the argmax
  *     pair) — the model is driver-side by design, like the IVF
  *     centroids; everything row-scale stays distributed.
  *   - The merge application is a per-row fold over a word's symbol
  *     array (`aggregate` HOF) — embarrassingly parallel, no shuffle.
  *
  * Determinism: ties on pair count break by (left, right) lexicographic
  * order, so the learned table is reproducible and the DuckDB oracle
  * unrolls the same iterations to identical merges.
  */
object Bpe {

  /** Word pretokenizer shared with the SQL oracle: lowercased runs of
    * `[a-z]+`. Count = corpus OCCURRENCES (every repeat of a word
    * re-weights its pairs), the standard BPE weighting. */
  val WordRegex = "[a-z]+"

  /** (word, f): the distinct-word frequency table — the ONLY pass over
    * the corpus; all merge iterations run on this. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    // fanOutExpansion: the regex word explode emits ~|words| rows per
    // doc — a small-input scan rebalances on the cheap text rows first;
    // no-op at corpus scale (Rebalance doc)
    Rebalance.fanOutExpansion(docs.select(col(textCol)))
      .select(explode(
        regexp_extract_all(lower(col(textCol)), lit(WordRegex), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** Initial segmentation: one single-character symbol per position. */
  def initialSeg(wf: DataFrame): DataFrame =
    wf.withColumn("seg", split(col("word"), ""))

  /** Adjacent-pair counts over current segmentations, weighted by word
    * frequency: (l, r, cnt). The pair space is bounded by the evolving
    * symbol vocabulary (676 at round 0 for `[a-z]` bigrams), so the
    * aggregate output is tiny regardless of corpus size. */
  def pairCounts(seg: DataFrame): DataFrame =
    seg.filter(size(col("seg")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, size(seg) - 1), " +
          "i -> struct(element_at(seg, i) AS l, element_at(seg, i + 1) AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("f")).as("cnt"))

  /** Greedy left-to-right merge of every adjacent (l, r) occurrence in
    * every segmentation — a per-row `aggregate` fold, zero shuffles.
    * `l`/`r` come from [[WordRegex]] words so they are quote-safe. */
  def applyMerge(seg: DataFrame, l: String, r: String): DataFrame = {
    require(l.matches("[a-z]+") && r.matches("[a-z]+"),
      s"applyMerge: symbols must be [a-z]+ (got '$l', '$r')")
    seg.withColumn("seg", expr(
      s"""aggregate(seg, cast(array() as array<string>),
         |  (acc, x) -> CASE
         |    WHEN size(acc) > 0 AND element_at(acc, -1) = '$l' AND x = '$r'
         |    THEN concat(slice(acc, 1, size(acc) - 1), array('$l$r'))
         |    ELSE concat(acc, array(x)) END)""".stripMargin))
  }

  /** One learned merge: rank, the pair, its count at merge time. */
  final case class Merge(rk: Int, l: String, r: String, cnt: Long)

  /** Train `nMerges` BPE merges. Each iteration: one distributed pair
    * count + one 1-row argmax collect + one fold projection. Vocabulary
    * generations are materialized (and superseded generations cleaned
    * up) so iteration k does not recompute k−1 nested folds. Stops
    * early when no pair remains (fully merged vocabulary). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges > 0, s"bpeTrain: nMerges must be positive, got $nMerges")
    var (seg, cleanup) =
      Dedup.materializeTracked(initialSeg(wordFreqs(docs, textCol)))
    val merges = Seq.newBuilder[Merge]
    var k = 1
    var done = false
    while (k <= nMerges && !done) {
      val top = pairCounts(seg)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(k, l, r, cnt)
        val (next, nextCleanup) =
          Dedup.materializeTracked(applyMerge(seg, l, r))
        cleanup(); cleanup = nextCleanup
        seg = next
        k += 1
      }
    }
    cleanup()
    merges.result()
  }

  /** [[train]] as a gate-shaped DataFrame: (rk, l, r, cnt). */
  def trainDf(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, nMerges).toDF("rk", "l", "r", "cnt")
  }

  /** Segment the corpus vocabulary with an ALREADY-LEARNED merge table
    * (ordered): the apply-side of the tokenizer, one fold per merge —
    * still zero shuffles beyond the vocabulary build. */
  def segment(wf: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(initialSeg(wf)) { case (df, (l, r)) =>
      applyMerge(df, l, r)
    }

  /** ---- Persisted vocabulary (the tokenizer artifact) ----
    *
    * A tokenizer vocabulary is the MOST-persisted artifact a training
    * pipeline owns: trained once over the full corpus (the expensive
    * op — every merge iteration is a vocabulary-table pass), then read
    * by every downstream encode for the lifetime of the model family,
    * across clusters and years. [[writeVocab]]/[[readVocab]] give the
    * merge table the same storage discipline as the serving indexes:
    *
    *  - `merges/` parquet — (rk, l, r, cnt), rank-ordered: BPE merges
    *    are a SEQUENCE, not a set (applying them out of order segments
    *    differently), so the rank rides with the rows and the reader
    *    sorts on it rather than trusting file order;
    *  - metadata carrying `kind`, the merge count, and the
    *    pretokenizer fingerprint ([[VocabScheme]]): a vocabulary
    *    trained under a different word regex / lowercasing rule
    *    segments text this engine never produced — load refuses it
    *    instead of silently mis-tokenizing;
    *  - version-pointer commit (`Dedup.swapInDir` + writer lease): a
    *    RETRAIN over a live vocabulary directory is atomic, concurrent
    *    retrains refuse, and in-flight encodes keep the snapshot they
    *    opened. A vocabulary version is immutable once written — there
    *    is no append/CDC surface, by design: merges are globally
    *    order-coupled, so "incremental vocab" is a retrain.
    *
    * Cited shape: the reference pipeline persists nothing model-like;
    * this is the `writeMinhashIndex` lifecycle applied to the
    * tokenizer-training operator the curation suite already carries. */
  private[graft] val VocabKind = "bpe_vocab"

  /** Pretokenizer fingerprint persisted with the vocabulary: the merge
    * table is only meaningful under the exact word-splitting rule it
    * was trained with. */
  private[graft] val VocabScheme = s"lower:$WordRegex:char-init"

  /** Persist a trained merge table under `dir` (atomic version-pointer
    * commit; a retrain over an existing vocabulary swaps whole). */
  def writeVocab(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], dir: String): Unit = {
    require(merges.nonEmpty, "writeVocab: empty merge table")
    IndexLease.withLease(spark, dir, "Bpe.writeVocab") {
      import spark.implicits._
      Dedup.swapInDir(spark, dir) { tmp =>
        Dedup.writeIndexTable(
          merges.toDF("rk", "l", "r", "cnt").coalesce(1),
          -1L, s"$tmp/merges", overwriteAll = true)
        Dedup.writeMeta(spark, tmp, Map(
          "kind" -> VocabKind,
          "n_merges" -> merges.size.toString,
          "scheme" -> VocabScheme))
      }
    }
  }

  /** Load a persisted vocabulary: the rank-ordered merge pairs, ready
    * for [[segment]]. Refuses a directory that is not a vocabulary or
    * was trained under a different pretokenizer scheme. */
  def readVocab(spark: org.apache.spark.sql.SparkSession,
                dir: String): Seq[(String, String)] = {
    // version snapshot: resolve once, like every index reader
    val root = Dedup.indexRoot(spark, dir)
    val meta = Dedup.readMeta(spark, root)
    require(meta.get("kind").contains(VocabKind),
      s"$dir is not a BPE vocabulary (kind=" +
        s"${meta.getOrElse("kind", "<absent>")})")
    require(meta.get("scheme").contains(VocabScheme),
      s"vocabulary at $dir was trained under scheme " +
        s"${meta.getOrElse("scheme", "<absent>")} but this engine " +
        s"pretokenizes with $VocabScheme — its merges segment text " +
        "differently; retrain with Bpe.train + writeVocab")
    val rows = Dedup.readPq(spark, s"$root/merges")
      .select("rk", "l", "r").collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    require(rows.size == meta("n_merges").toInt,
      s"vocabulary at $dir holds ${rows.size} merges but metadata " +
        s"declares ${meta("n_merges")} — torn write or foreign edit; " +
        "retrain with Bpe.train + writeVocab")
    rows
  }
}
