package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimJoin}

/** Prefix-filter similarity-join laws: the lossless theorem (results
  * equal the brute-force all-pairs join, pair for pair), threshold
  * monotonicity, and the integer prefix-length arithmetic. */
class SimJoinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.sources.Tables.documents(spark, dir)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  test("prefix filtering is lossless: equals brute-force all-pairs") {
    val got = pairs(SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 6, 10)
      .select("doc_a", "doc_b", "inter", "un"))
    // brute force over the same shingle sets
    val sets = Dedup.shingleHashesFlat(docs, "doc_id", "text")
      .filter(size(col("hs")) > 0)
    val brute = sets.select(col("doc_id").as("doc_a"), col("hs").as("ha"))
      .crossJoin(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter",
        graft.functions.exprs.intersect_count(col("ha"), col("hb"))
          .cast("long"))
      .withColumn("un",
        size(col("ha")).cast("long") + size(col("hb")) - col("inter"))
      .filter(col("inter") * 10 >= col("un") * 6)
      .select("doc_a", "doc_b", "inter", "un")
    assert(got == pairs(brute), "prefix join diverged from brute force")
    assert(got.nonEmpty, "fixture produced no qualifying pairs — gate is vacuous")
  }

  test("tighter thresholds return subsets") {
    val at50 = pairs(SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 5, 10)
      .select("doc_a", "doc_b", "inter", "un"))
    val at80 = pairs(SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 8, 10)
      .select("doc_a", "doc_b", "inter", "un"))
    assert(at80.subsetOf(at50))
  }

  test("persisted index: cross join is lossless vs brute bipartite") {
    val dir = graft.sources.Scratch.dir("pfx-idx-law")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    SimJoin.writePrefixIndex(even, "doc_id", "text", 6, 10, dir)
    val got = pairs(SimJoin.crossPrefixJoin(spark, odd, dir)
      .select("new_id", "matched_id", "inter", "un"))
    val sets = Dedup.shingleHashesFlat(docs, "doc_id", "text")
      .filter(size(col("hs")) > 0)
    val brute = sets.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("new_id"), col("hs").as("ha"))
      .crossJoin(sets.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("matched_id"), col("hs").as("hb")))
      .withColumn("inter",
        graft.functions.exprs.intersect_count(col("ha"), col("hb"))
          .cast("long"))
      .withColumn("un",
        size(col("ha")).cast("long") + size(col("hb")) - col("inter"))
      .filter(col("inter") * 10 >= col("un") * 6)
      .select("new_id", "matched_id", "inter", "un")
    assert(got == pairs(brute), "indexed cross join diverged from brute force")
    assert(got.nonEmpty, "bipartite fixture produced no pairs — gate vacuous")
  }

  test("append under a stale dictionary loses nothing; replay is a no-op") {
    val dir = graft.sources.Scratch.dir("pfx-idx-append")
    // fresh index over ALL even docs = the reference result
    val freshDir = graft.sources.Scratch.dir("pfx-idx-fresh")
    val odd = docs.filter(col("doc_id") % 2 === 1)
    SimJoin.writePrefixIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 6, 10, freshDir)
    val fresh = pairs(SimJoin.crossPrefixJoin(spark, odd, freshDir)
      .select("new_id", "matched_id", "inter", "un"))
    // half-built index + append of the other half under the STALE df
    SimJoin.writePrefixIndex(docs.filter(col("doc_id") % 4 === 0),
      "doc_id", "text", 6, 10, dir)
    SimJoin.appendPrefixIndex(spark, dir,
      docs.filter(col("doc_id") % 4 === 2), batchId = Some(0L))
    val stale = pairs(SimJoin.crossPrefixJoin(spark, odd, dir)
      .select("new_id", "matched_id", "inter", "un"))
    assert(stale == fresh,
      "stale-dictionary recall differs — order-invariance law broken")
    // replayed batchId: committed marker short-circuits, nothing changes
    val setsBefore = spark.read.parquet(s"${idxRoot(dir)}/sets").count()
    SimJoin.appendPrefixIndex(spark, dir,
      docs.filter(col("doc_id") % 4 === 2), batchId = Some(0L))
    assert(spark.read.parquet(s"${idxRoot(dir)}/sets").count() == setsBefore,
      "replayed append mutated the index")
    // rebuild refreshes the dictionary; the result must not move
    SimJoin.rebuildPrefixIndex(spark, dir)
    assert(pairs(SimJoin.crossPrefixJoin(spark, odd, dir)
      .select("new_id", "matched_id", "inter", "un")) == fresh,
      "rebuild changed the lossless result")
  }

  test("self-maintaining stream folds novel docs so later batches match them") {
    val root = graft.sources.Scratch.dir("pfx-selfmaint")
    // seed index: first 100 docs; stream the rest in TWO batches split
    // so batch 2 contains near-dups of batch-1 docs only via the fold
    val seed = docs.filter(col("doc_id") < 100)
    SimJoin.writePrefixIndex(seed, "doc_id", "text", 6, 10, s"$root/idx")
    val rest = docs.filter(col("doc_id") >= 100)
    rest.repartition(2).write.mode("overwrite").parquet(s"$root/in")
    val q = graft.streaming.StreamOps.selfMaintainingPrefixStream(
      spark.readStream.schema(rest.schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root/in"),
      s"$root/idx", s"$root/pairs", s"$root/ckpt")
    q.stop()
    // exact fold accounting over SHINGLED docs (empty-shingle docs are
    // invisible to both the index and the join): every shingled
    // streamed doc either matched (in pairs) or was folded into the
    // index — no third fate, no double counting
    def shingled(df: org.apache.spark.sql.DataFrame): Long =
      Dedup.shingleHashesFlat(df, "doc_id", "text")
        .filter(size(col("hs")) > 0).count()
    val idxDocs = spark.read.parquet(s"${idxRoot(s"$root/idx")}/sets")
      .select("doc_id").distinct().count()
    val paired = spark.read.parquet(s"$root/pairs")
      .select("new_id").distinct().count()
    assert(idxDocs + paired == shingled(seed) + shingled(rest),
      s"fold accounting broken: idx=$idxDocs paired=$paired " +
        s"expected total ${shingled(seed) + shingled(rest)}")
    // replay of an already-committed batch is a no-op on the index
    val before = spark.read.parquet(s"${idxRoot(s"$root/idx")}/sets").count()
    graft.streaming.StreamOps.processPrefixIngestBatch(
      rest.limit(5), 0L, s"$root/idx", s"$root/pairs")
    assert(spark.read.parquet(s"${idxRoot(s"$root/idx")}/sets").count() == before,
      "replayed committed batch mutated the index")
  }

  test("takedown: masked index equals a fresh live-corpus index; " +
    "rebuild removes tombstones physically") {
    val docs2 = docs
    val even = docs2.filter(col("doc_id") % 2 === 0)
    val odd = docs2.filter(col("doc_id") % 2 === 1)
    val tombs = even.filter(col("doc_id") % 5 === 1).select("doc_id")
    // fresh index over the LIVE corpus = the reference result
    val liveDir = graft.sources.Scratch.dir("pfx-del-live")
    SimJoin.writePrefixIndex(even.filter(col("doc_id") % 5 =!= 1),
      "doc_id", "text", 6, 10, liveDir)
    val fresh = pairs(SimJoin.crossPrefixJoin(spark, odd, liveDir)
      .select("new_id", "matched_id", "inter", "un"))
    // full index + tombstone mask must match it exactly
    val dir = graft.sources.Scratch.dir("pfx-del-mask")
    SimJoin.writePrefixIndex(even, "doc_id", "text", 6, 10, dir)
    val before = pairs(SimJoin.crossPrefixJoin(spark, odd, dir)
      .select("new_id", "matched_id", "inter", "un"))
    SimJoin.deleteFromPrefixIndex(spark, dir, tombs, batchId = Some(0L))
    val masked = pairs(SimJoin.crossPrefixJoin(spark, odd, dir)
      .select("new_id", "matched_id", "inter", "un"))
    assert(masked == fresh,
      "masked index diverged from a fresh live-corpus index")
    assert(masked != before,
      "tombstones removed no matching pairs — takedown law is vacuous")
    // replayed delete batch: committed marker short-circuits
    val tombRows = spark.read.parquet(s"${idxRoot(dir)}/tomb").count()
    SimJoin.deleteFromPrefixIndex(spark, dir, tombs, batchId = Some(0L))
    assert(spark.read.parquet(s"${idxRoot(dir)}/tomb").count() == tombRows,
      "replayed delete mutated the tombstone table")
    // rebuild compacts tombstones away: tomb/ gone, result unchanged,
    // deleted ids physically absent from the stored sets
    SimJoin.rebuildPrefixIndex(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${idxRoot(dir)}/tomb")),
      "rebuild kept the tombstone table")
    assert(spark.read.parquet(s"${idxRoot(dir)}/sets")
      .join(tombs, Seq("doc_id"), "left_semi").count() == 0,
      "rebuild kept tombstoned docs in the stored sets")
    assert(pairs(SimJoin.crossPrefixJoin(spark, odd, dir)
      .select("new_id", "matched_id", "inter", "un")) == fresh,
      "rebuild-after-delete changed the lossless result")
  }

  test("CDC: change batches ≡ fresh net-live index; delete+insert of " +
    "one id is an update; committed replay skips") {
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val even = docs.filter(col("doc_id") % 2 === 0)
    val base = even.filter(col("doc_id") % 10 =!= 4)
    val idxDir = graft.sources.Scratch.dir("pfx-cdc")
    SimJoin.writePrefixIndex(base, "doc_id", "text", 6, 10, idxDir)
    // batch 0: insert held-out docs; batch 1: delete the 5≡1 held ones
    SimJoin.applyPrefixCdc(spark, idxDir,
      even.filter(col("doc_id") % 10 === 4),
      even.limit(0).select("doc_id"), batchId = 0L)
    SimJoin.applyPrefixCdc(spark, idxDir, even.limit(0),
      even.filter(col("doc_id") % 5 === 1).select("doc_id"), batchId = 1L)
    // reference: a fresh index over exactly the net live corpus
    val liveDir = graft.sources.Scratch.dir("pfx-cdc-live")
    SimJoin.writePrefixIndex(even.filter(col("doc_id") % 5 =!= 1),
      "doc_id", "text", 6, 10, liveDir)
    val expected = pairs(SimJoin.crossPrefixJoin(spark, odd, liveDir)
      .select("new_id", "matched_id", "inter", "un"))
    val got = pairs(SimJoin.crossPrefixJoin(spark, odd, idxDir)
      .select("new_id", "matched_id", "inter", "un"))
    assert(expected.nonEmpty && got == expected,
      "CDC-maintained prefix index diverged from fresh net-live")
    // same-batch delete+insert is an UPDATE: the tombstone kills only
    // pre-batch rows (here: the base image of ovId), and the batch's
    // own insert — the new image — is indexed, matches, and verifies
    val ovDir = graft.sources.Scratch.dir("pfx-cdc-ov")
    SimJoin.writePrefixIndex(base, "doc_id", "text", 6, 10, ovDir)
    val ovId = base.select(min("doc_id")).head().getLong(0)
    val ovNew = base.filter(col("doc_id") === ovId)
      .withColumn("text", concat(col("text"), lit(" updated image suffix")))
    SimJoin.applyPrefixCdc(spark, ovDir, ovNew,
      ovNew.select("doc_id"), batchId = 0L)
    // probing with the NEW image must self-match at jaccard 1 — the
    // stored set is the new image, not the base one
    val self = SimJoin.crossPrefixJoin(spark, ovNew, ovDir)
      .filter(col("matched_id") === ovId)
    assert(self.count() == 1 &&
      self.head().getAs[Double]("jaccard") == 1.0,
      "same-batch delete+insert did not serve the updated image")
    // cross-batch re-insert of an id deleted in an earlier batch
    // serves too — delete is not a one-way door
    SimJoin.applyPrefixCdc(spark, ovDir, even.limit(0),
      ovNew.select("doc_id"), batchId = 1L)
    assert(SimJoin.crossPrefixJoin(spark, ovNew, ovDir)
      .filter(col("matched_id") === ovId).count() == 0,
      "batch-1 delete left the updated image serving")
    SimJoin.applyPrefixCdc(spark, ovDir, ovNew,
      even.limit(0).select("doc_id"), batchId = 2L)
    assert(SimJoin.crossPrefixJoin(spark, ovNew, ovDir)
      .filter(col("matched_id") === ovId).count() == 1,
      "cross-batch re-insert of a deleted id did not serve")
    // committed replay is skipped whole
    val setsBefore = spark.read.parquet(s"${idxRoot(idxDir)}/sets").count()
    SimJoin.applyPrefixCdc(spark, idxDir,
      even.filter(col("doc_id") % 10 === 4),
      even.filter(col("doc_id") % 5 === 1).select("doc_id"), batchId = 1L)
    assert(spark.read.parquet(s"${idxRoot(idxDir)}/sets").count() == setsBefore,
      "committed CDC replay mutated the index")
  }

  test("threshold 1 (exact duplicates only) yields identical sets") {
    val dup = SimJoin.prefixJaccardJoin(docs, "doc_id", "text", 1, 1)
      .collect()
    dup.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"threshold 1 admitted a non-identical pair: $r")
    }
  }
}
