package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, IndexLease}

/** The r16 commit-protocol laws: version-pointer replacement commits
  * (readers serve snapshots through rebuilds, crash leaves either the
  * old or the new version — never an unreadable or mixed state) and the
  * fenced single-writer lease (concurrent maintenance refuses loudly,
  * stale holders are taken over, a fenced writer aborts BEFORE
  * publishing). These are the two 100 TB operational properties the
  * delete+rename swap could not give: zero serving downtime under
  * hours-long maintenance, and enforcement — not documentation — of
  * the single-writer contract. */
class PointerLeaseSpec extends AnyFunSuite with SparkSpec {

  val base = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Set[Seq[String]] =
    df.collect().map(r =>
      Seq.tabulate(r.length)(i =>
        if (r.isNullAt(i)) "<NULL>" else r.get(i).toString)).toSet

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("reader-during-rebuild: an open handle keeps serving its " +
    "snapshot through a full rebuild; a new open sees the new version") {
    val docs = graft.sources.Tables.documents(spark, base).limit(60)
    val dir = graft.sources.Scratch.dir("ptr-reader")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", dir) // commits v1
    val v1 = idxRoot(dir)
    val handle = Dedup.readMinhashIndex(spark, dir) // resolves v1
    val before = canon(handle.sets)
    // a full rebuild commits v2 while the handle is open
    Dedup.rebuildMinhashIndex(spark, dir, numHashes = 16, bands = 8)
    assert(idxRoot(dir) != v1, "rebuild did not bump the version")
    // the OLD handle still serves its snapshot — v1's files survive
    // the commit (one-commit retention grace for open readers)
    assert(canon(handle.sets) == before,
      "open reader lost its snapshot at the rebuild commit")
    // a NEW open resolves the new version (16 hashes re-banded at 8)
    assert(Dedup.readMinhashIndex(spark, dir).nBands == 8)
    // ... and the version after next prunes v1: the grace is one commit
    Dedup.compactMinhashIndex(spark, dir) // commits v3
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(v1)),
      "v1 outlived its one-commit retention grace")
    assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == before,
      "content drifted across rebuild + compact")
  }

  test("crash at any point before the pointer rename leaves the old " +
    "version serving; the next attempt cleans the garbage and commits") {
    val docs = graft.sources.Tables.documents(spark, base).limit(50)
    val dir = graft.sources.Scratch.dir("ptr-crash")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", dir)
    val before = canon(Dedup.readMinhashIndex(spark, dir).sets)
    val v1 = idxRoot(dir)
    // crash DURING the replacement build: partial v2 exists, pointer
    // never moved — a reader must be completely unaffected
    intercept[RuntimeException] {
      Dedup.swapInDir(spark, dir) { tmp =>
        // a half-written layout: one table, no metadata
        docs.limit(5).select(col("doc_id")).write.parquet(s"$tmp/sets")
        throw new RuntimeException("synthetic crash mid-build")
      }
    }
    assert(idxRoot(dir) == v1, "a crashed build moved the pointer")
    assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == before,
      "a crashed build changed what readers see")
    // the next maintenance op deletes the orphan and commits normally
    Dedup.compactMinhashIndex(spark, dir)
    assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == before,
      "retry after crash diverged")
    // crash AFTER the pointer rename is just a completed commit: the
    // pointer is one atomic rename, so there is no intermediate state —
    // assert the invariant the layout rests on: CURRENT names a
    // complete, readable version at all times
    val cur = idxRoot(dir)
    assert(fsOf(dir).exists(
      new org.apache.hadoop.fs.Path(cur, Dedup.IndexMetaFile)),
      "committed version is missing its metadata")
    // a hand-corrupted pointer refuses loudly, naming the remedy
    val p = new org.apache.hadoop.fs.Path(dir, Dedup.PointerFile)
    val out = fsOf(dir).create(p, true)
    out.write("vTrash\n".getBytes("UTF-8")); out.close()
    val ex = intercept[IllegalArgumentException] {
      Dedup.readMinhashIndex(spark, dir)
    }
    assert(ex.getMessage.contains("CURRENT"),
      s"corrupt-pointer error does not name the fix: ${ex.getMessage}")
  }

  test("concurrent writer refuses loudly naming the holder; a stale " +
    "lease is taken over") {
    val docs = graft.sources.Tables.documents(spark, base).limit(40)
    val dir = graft.sources.Scratch.dir("lease-conc")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", dir)
    val before = canon(Dedup.readMinhashIndex(spark, dir).sets)
    def plantLease(ts: Long): Unit = {
      val p = new org.apache.hadoop.fs.Path(dir, Dedup.LeaseFile)
      val out = fsOf(dir).create(p, true)
      val props = new java.util.Properties()
      props.setProperty("token", "11112222-3333-4444-5555-666677778888")
      props.setProperty("op", "otherWriter.compact")
      props.setProperty("ts", ts.toString)
      try props.store(out, "test") finally out.close()
    }
    // another writer holds a FRESH lease: every mutation refuses,
    // naming the holder's op; reads are never blocked
    plantLease(System.currentTimeMillis())
    val ex = intercept[IllegalArgumentException] {
      Dedup.compactMinhashIndex(spark, dir)
    }
    assert(ex.getMessage.contains("otherWriter.compact"),
      s"refusal does not name the holder: ${ex.getMessage}")
    assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == before,
      "a refused writer left tracks, or a lease blocked a READ")
    // the holder is long dead (lease older than the TTL): the next
    // writer takes over and completes
    plantLease(System.currentTimeMillis() - IndexLease.ttlMs - 60000L)
    Dedup.compactMinhashIndex(spark, dir)
    assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == before,
      "takeover compaction changed content")
    assert(IndexLease.status(spark, dir).isEmpty,
      "lease not released after the takeover writer completed")
  }

  test("raised retention still prunes a migrated flat layout's legacy " +
    "tables at the v2 commit") {
    // retention keeps more version DIRS; it must not let the migrated
    // flat layout's top-level tables (or swap residue) linger for
    // retainVersions-1 commits (advisor r16)
    val docs = graft.sources.Tables.documents(spark, base).limit(60)
    val vdir = graft.sources.Scratch.dir("ptr-flat-src")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", vdir) // v1 + CURRENT
    // materialize a FLAT pre-pointer layout: v1's tables at top level,
    // no CURRENT — what a pre-pointer engine left on disk
    val dir = graft.sources.Scratch.dir("ptr-flat")
    val conf = spark.sparkContext.hadoopConfiguration
    fsOf(vdir).listStatus(new org.apache.hadoop.fs.Path(s"$vdir/v1"))
      .foreach { s =>
        org.apache.hadoop.fs.FileUtil.copy(fsOf(vdir), s.getPath,
          fsOf(dir),
          new org.apache.hadoop.fs.Path(dir, s.getPath.getName),
          false, true, conf)
      }
    assert(Dedup.listVersions(spark, dir).isEmpty,
      "flat fixture unexpectedly carries version dirs")
    val before = canon(Dedup.readMinhashIndex(spark, dir).sets)
    System.setProperty("graft.index.retain.versions", "4")
    try {
      Dedup.compactMinhashIndex(spark, dir) // migration commit: v1
      Dedup.compactMinhashIndex(spark, dir) // v2 — the legacy prune point
      assert(Dedup.listVersions(spark, dir) == Seq(1, 2))
      val top = fsOf(dir)
        .listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath.getName).toSet
      val lingering = top.filterNot(n =>
        n.matches("^v\\d+$") || n == Dedup.PointerFile ||
          n == Dedup.PointerFile + ".tmp" || n == Dedup.LeaseFile)
      assert(lingering.isEmpty,
        s"legacy flat tables lingered under raised retention: $lingering")
      assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == before,
        "migration + prune changed served content")
    } finally System.clearProperty("graft.index.retain.versions")
  }

  test("pinned-version reads: versionRoot serves an exact snapshot " +
    "through later commits; retention is configurable; pruned versions " +
    "refuse by name") {
    val docs = graft.sources.Tables.documents(spark, base).limit(60)
    val dir = graft.sources.Scratch.dir("ptr-pinned")
    System.setProperty("graft.index.retain.versions", "3")
    try {
      Dedup.writeMinhashIndex(docs, "doc_id", "text", dir) // v1
      val v1Sets = canon(Dedup.readMinhashIndex(spark, dir).sets)
      assert(Dedup.listVersions(spark, dir) == Seq(1))
      // a replacement commit FREEZES every older version: in-place
      // maintenance only ever touches CURRENT, so once v2 exists, v1
      // is immutable — the snapshot a pinned reader can trust
      Dedup.rebuildMinhashIndex(spark, dir) // v2 (same content)
      Dedup.deleteFromMinhashIndex(spark, dir,
        docs.filter(col("doc_id") % 3 === 0).select("doc_id")) // v2 in place
      assert(Dedup.listVersions(spark, dir) == Seq(1, 2))
      val pinned = Dedup.readMinhashIndex(spark,
        Dedup.versionRoot(spark, dir, 1))
      assert(canon(pinned.sets) == v1Sets,
        "pinned (frozen) v1 does not serve the pre-delete snapshot")
      assert(canon(Dedup.readMinhashIndex(spark, dir).sets) != v1Sets,
        "CURRENT still serves the pre-delete corpus — vacuous pin")
      // raised retention keeps deeper history: with retain=3, the v3
      // commit must leave v1 on disk (default 2 would prune it)
      Dedup.compactMinhashIndex(spark, dir) // v3
      assert(Dedup.listVersions(spark, dir) == Seq(1, 2, 3),
        "retention=3 did not keep three versions")
      assert(canon(Dedup.readMinhashIndex(spark,
        Dedup.versionRoot(spark, dir, 1)).sets) == v1Sets,
        "deep-retained v1 stopped serving")
    } finally System.clearProperty("graft.index.retain.versions")
    // back at the default, the next commit prunes to the newest two,
    // and opening a pruned version refuses naming what IS on disk
    Dedup.compactMinhashIndex(spark, dir) // v4 -> prune v1, v2
    assert(Dedup.listVersions(spark, dir) == Seq(3, 4),
      "default retention did not prune to the newest two")
    val ex = intercept[IllegalArgumentException] {
      Dedup.versionRoot(spark, dir, 1)
    }
    assert(ex.getMessage.contains("no version 1") &&
      ex.getMessage.contains("v3"),
      s"pruned-version refusal unhelpful: ${ex.getMessage}")
  }

  test("a writer whose lease was taken over is FENCED at the commit " +
    "point — nothing is published") {
    val docs = graft.sources.Tables.documents(spark, base).limit(40)
    val dir = graft.sources.Scratch.dir("lease-fence")
    Dedup.writeMinhashIndex(docs, "doc_id", "text", dir)
    val before = canon(Dedup.readMinhashIndex(spark, dir).sets)
    val verBefore = idxRoot(dir)
    val ex = intercept[Exception] {
      IndexLease.withLease(spark, dir, "slowWriter.compact") {
        // while this writer runs (presumed crashed past the TTL),
        // another writer takes the lease over
        val p = new org.apache.hadoop.fs.Path(dir, Dedup.LeaseFile)
        val out = fsOf(dir).create(p, true)
        val props = new java.util.Properties()
        props.setProperty("token", "99990000-aaaa-bbbb-cccc-ddddeeee0000")
        props.setProperty("op", "takeoverWriter.rebuild")
        props.setProperty("ts", System.currentTimeMillis().toString)
        try props.store(out, "test") finally out.close()
        // the zombie reaches its commit: the fence must stop it HERE
        Dedup.compactMinhashIndex(spark, dir)
      }
    }
    assert(ex.getMessage.contains("fenced"),
      s"zombie commit was not fenced: ${ex.getMessage}")
    assert(idxRoot(dir) == verBefore,
      "a fenced writer still published a version")
    assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == before,
      "a fenced writer changed served content")
    // the takeover winner's lease survives the zombie's cleanup path
    assert(IndexLease.status(spark, dir)
      .exists(_.op == "takeoverWriter.rebuild"),
      "the fenced writer's cleanup released the new holder's lease")
  }

  test("explicit pruneVersions: the compliance retention pass — " +
      "serving version always survives, pruned pins refuse, bad args " +
      "refuse, sharded walk skips single-version shards") {
    val docs = graft.sources.Tables.documents(spark, base)
    val dir = graft.sources.Scratch.dir("prune-explicit")
    Dedup.writeMinhashIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    Dedup.deleteFromMinhashIndex(spark, dir,
      docs.filter(col("doc_id") % 10 === 2).select("doc_id"),
      batchId = Some(0L))
    Dedup.rebuildMinhashIndex(spark, dir)
    val vs = Dedup.listVersions(spark, dir)
    assert(vs.size >= 2)
    val servedBefore = canon(Dedup.readMinhashIndex(spark, dir).sets)
    Dedup.pruneVersions(spark, dir, keep = 1)
    // exactly the serving version remains, content unmoved
    assert(Dedup.listVersions(spark, dir) == Seq(vs.last))
    assert(canon(Dedup.readMinhashIndex(spark, dir).sets) == servedBefore,
      "pruning old versions moved the served content")
    // the pinned read of a pruned version refuses by name
    val ex = intercept[IllegalArgumentException] {
      Dedup.versionRoot(spark, dir, vs.head)
    }
    assert(ex.getMessage.contains("pruned by retention"))
    // bad args refuse loudly
    intercept[IllegalArgumentException] {
      Dedup.pruneVersions(spark, dir, keep = 0)
    }
    val flat = graft.sources.Scratch.dir("prune-flat")
    intercept[IllegalArgumentException] {
      Dedup.pruneVersions(spark, flat)
    }
    // sharded walk: only the compacted (re-versioned) shard prunes;
    // single-version shards are untouched
    val home = graft.sources.Scratch.dir("prune-sharded")
    graft.operators.ShardedIndex.writeBm25(
      docs.filter(col("doc_id") % 2 === 0), home, shards = 2)
    graft.operators.IndexCdc.compact(spark,
      graft.operators.ShardedIndex.shardDir(home, 0))
    assert(Dedup.listVersions(spark,
      graft.operators.ShardedIndex.shardDir(home, 0)).size == 2)
    graft.operators.ShardedIndex.pruneVersions(spark, home)
    (0 to 1).foreach { i =>
      assert(Dedup.listVersions(spark,
        graft.operators.ShardedIndex.shardDir(home, i)).size == 1,
        s"shard $i not at a single version after the sharded prune")
    }
  }
}
