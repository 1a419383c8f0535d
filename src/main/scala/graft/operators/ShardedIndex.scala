package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-sharded layout for the persisted index families — the piece
  * that bounds the MAINTENANCE unit at 100 TB. A single index home is
  * already cheap to SERVE at any size (every read is query-bounded)
  * and cheap to APPEND to (batch-bounded partitions), but its
  * replacement ops are not: `compact`/`rebuild` rewrite the WHOLE
  * artifact through one version commit, so their cost — and the 2×
  * retention footprint, and the blast radius of one corrupted layout —
  * scales with the corpus instead of with the churn. Sharding fixes
  * the unit of work, not the dataflow:
  *
  *   - `<home>/_graft_index_meta.properties` — the MANIFEST:
  *     `kind=sharded_index`, the child family's kind, the shard count,
  *     the routing column and router fingerprint, and the home-level
  *     `last_committed_batch` fast-skip marker;
  *   - `<home>/shard=<i>` for i ∈ [0, shards) — each a COMPLETE,
  *     self-contained index home of the child family (own version
  *     pointer, own lease, own marker, own tombstones), maintained by
  *     the family's own ops.
  *
  * Routing is `pmod(xxhash64(id), shards)` — deterministic across
  * runs and engines (Spark's xxhash64 with its fixed seed), fingerprinted
  * in the manifest so an index written under a different router can
  * never be silently mis-probed. Every document/vector lives in
  * EXACTLY one shard, so:
  *
  *   - **compaction/rebuild cost ∝ churned shards**: [[compact]] folds
  *     only the shards fragmented past a file bound — an index where
  *     churn hit 1 of 64 shards rewrites 1/64th of the bytes (the
  *     monolithic home rewrites everything, every time);
  *   - **maintenance parallelism**: shards are independent writer
  *     domains (per-shard leases) — a fleet can rebuild all shards
  *     concurrently, while the home-level ops here take the HOME lease
  *     to keep multi-shard change application single-writer;
  *   - **serving stays exact**: a sharded read is the union of
  *     per-shard query-bounded reads — same total match stream, same
  *     boards. For BM25 the global statistics fold across shards
  *     exactly ([[crossBm25TopKSharded]]): df and (N, S) are
  *     distributive over the disjoint shard partition of the corpus,
  *     so a sharded board is bit-identical to the unsharded one —
  *     shard count is an OPERATIONAL knob, never a semantics knob.
  *
  * Change application ([[applyCdc]]) routes one CDC batch to the
  * shards it touches (skipping untouched shards entirely — a sparse
  * takedown batch costs its own shards, not all S) and applies each
  * slice through [[IndexCdc]] under the batch's own id. Crash story:
  * per-shard commits are the family's marker protocol; a crash
  * mid-loop leaves a PREFIX of shards at `batchId` (readers see a
  * cross-shard torn batch — each shard internally consistent), the
  * home marker unbumped, and the replay walks the same deterministic
  * routing: committed shards skip, the rest apply — exactly-once per
  * shard, heal-by-replay across shards. [[IndexAudit.audit]] reports
  * per-shard health plus the cross-shard marker spread.
  *
  * Batched-only by design: the synchronous (batchId = None) one-shots
  * the single homes offer are the SMALL-index convenience; a sharded
  * home is the at-scale form, where every change must be replayable. */
object ShardedIndex {

  private[graft] val Kind = "sharded_index"
  /** Router fingerprint persisted in the manifest — an index routed
    * under anything else must refuse at open, or probes would silently
    * miss the shard that actually holds an id. */
  private[graft] val Router = "xxhash64(seed=42):pmod"

  /** The child families this layout can shard: anything [[IndexCdc]]
    * can route a change batch to. */
  private val cdcKinds = Set(Bm25Index.Kind, Dedup.MinhashIndexKind,
    SimJoin.PrefixIndexKind, Similarity.IvfIndexKind,
    Similarity.EmbeddingIndexKind)

  private val vecKinds = Set(Similarity.IvfIndexKind,
    Similarity.EmbeddingIndexKind)

  /** The shard an id routes to — one deterministic integer in
    * [0, shards). */
  def shardOf(id: Column, shards: Int): Column =
    pmod(xxhash64(id), lit(shards.toLong)).cast("int")

  /** The home directory of shard `i`. */
  def shardDir(home: String, i: Int): String = s"$home/shard=$i"

  private def shardDirs(home: String, m: Map[String, String]): Seq[String] =
    (0 until m("shards").toInt).map(shardDir(home, _))

  /** The manifest at `home`, validated. */
  private[graft] def manifest(spark: SparkSession,
                              home: String): Map[String, String] = {
    val m = Dedup.readMeta(spark, home)
    require(m.get("kind").contains(Kind),
      s"$home is not a sharded index (kind=${m.getOrElse("kind", "<absent>")})")
    require(m.get("router").contains(Router),
      s"sharded index at $home was routed by '${m.getOrElse("router", "?")}'" +
        s" but this engine probes with '$Router' — ids would be looked " +
        "up in the wrong shard; rebuild with this engine's writer")
    require(m.contains("shards") && m.contains("child_kind"), {
      s"sharded-index manifest at $home is missing shards/child_kind"
    })
    m
  }

  /** The routing id column for a child family (vector families key on
    * `vec_id` whatever the caller's document-id name is). */
  private def routeCol(childKind: String, id: String): String =
    if (vecKinds(childKind)) "vec_id" else id

  /** Stages `df` into `<home>/_staging_<tag>` partitioned by the shard
    * column, so the per-shard loop reads partition-PRUNED slices of one
    * materialized pass instead of rescanning the input S times. The
    * partition column must not start with `_` or the hidden-file filter
    * would drop its directories from the read-back listing. An empty
    * input (e.g. an insert-only batch's delete side) stages nothing.
    * Returns (per-shard reader, shards actually present, cleanup). */
  private def stageRouted(df: DataFrame, home: String, shards: Int,
                          idCol: String, tag: String)
      : (Int => DataFrame, Seq[Int], () => Unit) =
    if (df.isEmpty) ((_: Int) => df.limit(0), Seq.empty[Int], () => ())
    else {
      val spark = df.sparkSession
      val dir = s"$home/_staging_$tag"
      df.withColumn("g_shard", shardOf(col(idCol), shards))
        .write.mode("overwrite").partitionBy("g_shard").parquet(dir)
      val staged = spark.read.parquet(dir)
      val present = staged.select("g_shard").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (i => staged.filter(col("g_shard") === i).drop("g_shard"),
        present,
        () => { fs.delete(new org.apache.hadoop.fs.Path(dir), true); () })
    }

  /** Builds a sharded index: routes `corpus` once (one staged pass),
    * then hands each shard's slice to `writeShard` — the child
    * family's own writer, so every shard is a complete normal index
    * home. The manifest lands LAST: it is the commit point (a crashed
    * build leaves shard dirs no reader resolves; re-running write
    * replaces them through the shards' own pointer commits).
    *
    * Every shard must be non-empty: the child families refuse
    * empty-born artifacts by design, and a shard count that outruns
    * the corpus is a sizing error better caught at build than at
    * serve. Uniform hash routing makes this a non-event at any real
    * corpus/shard ratio. */
  def write(corpus: DataFrame, home: String, shards: Int,
            childKind: String, idCol: String)
           (writeShard: (DataFrame, String) => Unit): Unit = {
    require(shards > 0, s"ShardedIndex.write: shards must be > 0, got $shards")
    require(cdcKinds(childKind),
      s"ShardedIndex.write: no CDC-routable child family '$childKind'")
    val spark = corpus.sparkSession
    IndexLease.withLease(spark, home, "ShardedIndex.write") {
      val (slice, present, cleanup) =
        stageRouted(corpus, home, shards, idCol, "write")
      try {
        val missing = (0 until shards).filterNot(present.contains)
        require(missing.isEmpty,
          s"ShardedIndex.write: shard(s) ${missing.mkString(",")} of " +
            s"$shards would be empty — the corpus cannot fill this many " +
            "shards; lower the shard count")
        (0 until shards).foreach(i => writeShard(slice(i), shardDir(home, i)))
        Dedup.writeMeta(spark, home, Map(
          "kind" -> Kind, "child_kind" -> childKind,
          "shards" -> shards.toString, "id_col" -> idCol,
          "router" -> Router))
      } finally cleanup()
    }
  }

  /** [[write]] with a BM25 child per shard. */
  def writeBm25(corpus: DataFrame, home: String, shards: Int,
                id: String = "doc_id", text: String = "text"): Unit =
    write(corpus, home, shards, Bm25Index.Kind, id)(
      (df, dir) => Bm25Index.write(df, dir, id, text))

  /** [[write]] with a minhash-LSH child per shard. */
  def writeMinhash(corpus: DataFrame, home: String, shards: Int,
                   id: String = "doc_id", text: String = "text",
                   numHashes: Int = 16, bands: Int = 4): Unit =
    write(corpus, home, shards, Dedup.MinhashIndexKind, id)(
      (df, dir) => Dedup.writeMinhashIndex(df, id, text, dir,
        numHashes, bands))

  /** [[write]] with a sign-LSH embedding child per shard. `rowBits`
    * must be explicit (> 0): the single-home writer's auto-sizing
    * keys the band space off the CORPUS count, and per-shard
    * auto-sizing would cut each shard's keys in a different band
    * space — the drift [[readEmbeddingSharded]] refuses. One global
    * blocking decision, S identical key spaces. */
  def writeEmbedding(corpus: DataFrame, home: String, shards: Int,
                     bands: Int, rowBits: Int): Unit = {
    require(rowBits > 0,
      "ShardedIndex.writeEmbedding: pass an explicit rowBits — " +
        "per-shard auto-sizing would cut each shard's band keys in a " +
        "different band space (size off the GLOBAL corpus count, e.g. " +
        "Similarity.autoRowBits)")
    write(corpus, home, shards, Similarity.EmbeddingIndexKind, "vec_id")(
      (df, dir) => Similarity.writeEmbeddingIndex(df, dir, bands, rowBits))
  }

  /** One CDC change batch (inserts + deletes under a durable
    * `batchId`) routed to the shards it touches and applied through
    * each child's own [[IndexCdc]] applier. Untouched shards are
    * never opened. Replay: the home marker fast-skips a fully-applied
    * batch; a batch whose previous attempt crashed mid-loop re-routes
    * identically and each shard's own marker skips or applies —
    * exactly-once per shard. The home marker commits strictly LAST. */
  def applyCdc(spark: SparkSession, home: String, inserts: DataFrame,
               deletes: DataFrame, batchId: Long,
               id: String = "doc_id", text: String = "text"): Unit =
    IndexLease.withLease(spark, home, "ShardedIndex.applyCdc") {
      val m = manifest(spark, home)
      if (batchId <= Dedup.lastCommittedBatch(m)) return
      val childKind = m("child_kind")
      val shards = m("shards").toInt
      val rid = routeCol(childKind, id)
      val (insSlice, insShards, cleanI) =
        stageRouted(inserts, home, shards, rid, s"ins_$batchId")
      val (delSlice, delShards, cleanD) =
        stageRouted(deletes, home, shards, rid, s"del_$batchId")
      try {
        (insShards ++ delShards).distinct.sorted.foreach { i =>
          IndexCdc.apply(spark, shardDir(home, i), insSlice(i), delSlice(i),
            batchId, id, text)
        }
        Dedup.writeMeta(spark, home,
          m + ("last_committed_batch" -> batchId.toString))
      } finally { cleanI(); cleanD() }
    }

  /** Insert-only [[applyCdc]]. */
  def append(spark: SparkSession, home: String, newRows: DataFrame,
             batchId: Long, id: String = "doc_id",
             text: String = "text"): Unit =
    applyCdc(spark, home, newRows,
      emptyDeletes(spark, manifest(spark, home)("child_kind"), id),
      batchId, id, text)

  /** Takedown-only [[applyCdc]]. */
  def delete(spark: SparkSession, home: String, tombstones: DataFrame,
             batchId: Long, id: String = "doc_id",
             text: String = "text"): Unit = {
    val m = manifest(spark, home)
    applyCdc(spark, home, emptyInserts(spark, m("child_kind"), id, text),
      tombstones, batchId, id, text)
  }

  private def emptyDeletes(spark: SparkSession, childKind: String,
                           id: String): DataFrame =
    spark.range(0).select(col("id").cast("long").as(routeCol(childKind, id)))

  private def emptyInserts(spark: SparkSession, childKind: String,
                           id: String, text: String): DataFrame =
    if (vecKinds(childKind))
      spark.range(0).select(col("id").cast("long").as("vec_id"),
        array().cast("array<float>").as("embedding"))
    else
      spark.range(0).select(col("id").cast("long").as(id),
        lit("").as(text))

  /** Data-file count across a shard's core tables — the fragmentation
    * measure [[compact]] selects on (listing cost only). */
  private def shardFiles(spark: SparkSession, dir: String,
                         childKind: String): Long = {
    val root = Dedup.indexRoot(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (IndexAudit.layout(childKind) :+ "tomb").map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$root/$t")
      if (fs.exists(p)) IndexAudit.countParquetFiles(fs, p) else 0L
    }.sum
  }

  /** SELECTIVE compaction — the op sharding exists for: folds only the
    * shards whose data-file count exceeds `minFiles` (0 = every
    * shard), through each child family's own row-preserving compact.
    * Cost ∝ the churned shards' bytes; an untouched shard's version
    * pointer never moves. Returns the shard ids compacted. */
  def compact(spark: SparkSession, home: String, targetFiles: Int = 4,
              minFiles: Long = 0L): Seq[Int] =
    IndexLease.withLease(spark, home, "ShardedIndex.compact") {
      val m = manifest(spark, home)
      val childKind = m("child_kind")
      (0 until m("shards").toInt).filter { i =>
        minFiles <= 0L ||
          shardFiles(spark, shardDir(home, i), childKind) > minFiles
      }.map { i => IndexCdc.compact(spark, shardDir(home, i), targetFiles); i }
    }

  /** Per-shard rebuild — the deep-hygiene twin of [[compact]]: every
    * shard's tombstoned rows are removed physically, batch partitions
    * fold into the base, and the shard commits its own new version
    * (untouched READERS keep their snapshots, as ever). The loop here
    * is sequential; at deployment scale each shard's rebuild is an
    * independent leased job — fan the shard list across a fleet for
    * the S-way speedup that is the layout's point. An all-deleted
    * shard is left as-is (its child rebuild refuses on an empty live
    * set; the masked shard serves empty boards correctly — physical
    * reclamation of a fully-dead shard is a re-shard/rewrite
    * decision). Returns the shard ids rebuilt. */
  def rebuild(spark: SparkSession, home: String): Seq[Int] =
    IndexLease.withLease(spark, home, "ShardedIndex.rebuild") {
      val m = manifest(spark, home)
      (0 until m("shards").toInt).filter { i =>
        val dir = shardDir(home, i)
        if (IndexCdc.liveIds(spark, dir).isEmpty) false
        else { IndexCdc.rebuild(spark, dir); true }
      }
    }

  /** Revise the SIZING decision: build a `newShards`-way home at
    * `newHome` from the LIVE rows of the index at `oldHome` — which
    * may be a sharded home (re-shard: S was chosen too small and
    * shards outgrew the maintenance window) or a monolithic home
    * (first sharding of an index that grew past one rewrite unit).
    * The original corpus is NOT needed:
    *
    *   - BM25 rebuilds each new shard from its live-postings slice
    *     (df/(N, S) re-derive per slice, exact by distributivity);
    *   - minhash routes the stored bands/sets rows (signatures are
    *     per-document deterministic under the stored parameters);
    *   - sign-LSH re-keys the stored vectors under the stored
    *     (bands, rowBits) — the same global blocking, S' key spaces.
    *
    * The old home is READ-ONLY here and keeps serving; cut-over is
    * the caller's pointer/path swap, and the old home's directory can
    * be deleted after. Boards from the new home are bit-identical to
    * the old one's — shard count stays an operational knob through
    * the resize. */
  def reshard(spark: SparkSession, oldHome: String, newHome: String,
              newShards: Int): Unit = {
    require(oldHome != newHome,
      "ShardedIndex.reshard builds a NEW home beside the old one " +
        "(the old home keeps serving until the caller cuts over) — " +
        "pass a different newHome")
    val meta = Dedup.readMeta(spark, Dedup.indexRoot(spark, oldHome))
    val (childKind, olds) = meta.getOrElse("kind", "<absent>") match {
      case Kind =>
        val m = manifest(spark, oldHome)
        (m("child_kind"), shardDirs(oldHome, m))
      case k => (k, Seq(oldHome))
    }
    childKind match {
      case Bm25Index.Kind =>
        val post = olds.map(Bm25Index.livePostings(spark, _))
          .reduce(_.unionByName(_))
        write(post, newHome, newShards, Bm25Index.Kind, "doc_id")(
          (df, dir) => Bm25Index.writeFromPostings(df, dir))
      case Similarity.EmbeddingIndexKind =>
        val idxs = olds.map(Similarity.readEmbeddingIndex(spark, _))
        val params = idxs.map(i => (i.nBands, i.rowBits)).distinct
        require(params.size == 1,
          s"reshard: drifting per-shard (bands, rowBits) $params at " +
            s"$oldHome; rebuild under one blocking first")
        val vectors = idxs.map(_.vectors).reduce(_.unionByName(_))
        write(vectors, newHome, newShards,
          Similarity.EmbeddingIndexKind, "vec_id")(
          (df, dir) => Similarity.writeEmbeddingIndex(df, dir,
            params.head._1, params.head._2))
      case Dedup.MinhashIndexKind =>
        val idxs = olds.map(Dedup.readMinhashIndex(spark, _))
        val params = idxs.map(i => (i.numHashes, i.nBands)).distinct
        require(params.size == 1,
          s"reshard: drifting per-shard (numHashes, bands) $params at " +
            s"$oldHome; rebuild under one family first")
        val bands = idxs.map(_.bands).reduce(_.unionByName(_))
        val sets = idxs.map(_.sets).reduce(_.unionByName(_))
        // two coupled tables: route both by the SAME key, then write
        // each shard from its slices (the generic write routes one
        // frame, so this family loops directly)
        IndexLease.withLease(spark, newHome, "ShardedIndex.reshard") {
          val (bSlice, _, cleanB) =
            stageRouted(bands, newHome, newShards, "doc_id", "rs_bands")
          val (sSlice, present, cleanS) =
            stageRouted(sets, newHome, newShards, "doc_id", "rs_sets")
          try {
            val missing = (0 until newShards).filterNot(present.contains)
            require(missing.isEmpty,
              s"reshard: shard(s) ${missing.mkString(",")} of " +
                s"$newShards would be empty — lower the shard count")
            (0 until newShards).foreach(i =>
              Dedup.writeMinhashFromTables(bSlice(i), sSlice(i),
                params.head._1, params.head._2, shardDir(newHome, i)))
            Dedup.writeMeta(spark, newHome, Map(
              "kind" -> Kind, "child_kind" -> Dedup.MinhashIndexKind,
              "shards" -> newShards.toString, "id_col" -> "doc_id",
              "router" -> Router))
          } finally { cleanB(); cleanS() }
        }
      case other => throw new IllegalArgumentException(
        s"ShardedIndex.reshard: no live-row rewriter for child family " +
          s"'$other' — supported: bm25_index, minhash-v2, signlsh-v2")
    }
  }

  /** Serve a query batch from a sharded BM25 index — bit-identical to
    * [[Bm25Index.crossBm25TopK]] over one home holding the same live
    * corpus, at ANY shard count. Exactness argument: the shards
    * partition the corpus disjointly and df/(N, S) are distributive
    * counts, so Σ over per-shard signed folds IS the global statistic;
    * every match-stream row carries the same (tf, dl) it would carry
    * unsharded; scores are integer micro-units summed per (query, doc)
    * — order-free. Cost: the same query-term-bounded match stream
    * (each shard contributes its slice, union is one lazy plan — ONE
    * job, not S), plus a vocab-bounded df fold per shard. */
  def crossBm25TopKSharded(spark: SparkSession, queries: DataFrame,
                           home: String, k: Int = 5,
                           qid: String = "query_id",
                           qtext: String = "query_text",
                           maxDfFrac: Double = 1.0): DataFrame = {
    require(k > 0, s"crossBm25TopKSharded: k must be positive, got $k")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"crossBm25TopKSharded: maxDfFrac must be in (0, 1], got $maxDfFrac")
    val m = manifest(spark, home)
    require(m("child_kind") == Bm25Index.Kind,
      s"sharded index at $home holds ${m("child_kind")}, not BM25")
    val dirs = shardDirs(home, m)
    // global (N, S): Σ of per-shard folds — tolerant per shard (a
    // takedown may have emptied one), refused only on the global total
    val stats = dirs.map(Bm25Index.foldedStatsTolerant(spark, _))
    val nDocs = stats.map(_._1).sum
    val sTok = stats.map(_._2).sum
    require(nDocs > 0,
      s"sharded BM25 index at $home holds no committed documents")
    val globalDf = dirs.map(Bm25Index.foldedDf(spark, _))
      .reduce(_.unionByName(_))
      .groupBy("term").agg(sum(col("df")).as("df"))
    val kept = TextOps.bm25KeptTerms(globalDf, nDocs, maxDfFrac)
    val qterms = TextOps.bm25QueryTerms(queries, qid, qtext)
    val probedKeys = broadcast(qterms.select("term").distinct())
    val post = dirs
      .map(Bm25Index.liveTermBoundedPostings(spark, _, probedKeys))
      .reduce(_.unionByName(_))
    val scored = post
      .join(kept, Seq("term"))
      .join(qterms, Seq("term"))
      .transform(TextOps.withBm25Score(nDocs, sTok))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__sc")).as("score_micro"))
    TextOps.bm25Board(scored, k)
  }

  /** Open a sharded minhash index as ONE [[Dedup.MinhashIndex]] handle:
    * bands/sets are the lazy union of the per-shard live views (each
    * already tombstone-masked at its own choke point), parameters
    * pinned equal across shards — so every existing consumer
    * ([[Dedup.crossMinhashPairs]], the ingestion loop) works on a
    * sharded home unchanged. Band-bucket candidate generation is
    * unaffected by WHERE a doc's rows live: the bucket join sees the
    * union, exactly as unsharded. */
  def readMinhashSharded(spark: SparkSession,
                         home: String): Dedup.MinhashIndex = {
    val m = manifest(spark, home)
    require(m("child_kind") == Dedup.MinhashIndexKind,
      s"sharded index at $home holds ${m("child_kind")}, not minhash")
    val idxs = shardDirs(home, m).map(Dedup.readMinhashIndex(spark, _))
    val params = idxs.map(i => (i.numHashes, i.nBands)).distinct
    require(params.size == 1,
      s"sharded minhash at $home has drifting per-shard parameters " +
        s"$params — shards were maintained by different writers; rebuild")
    Dedup.MinhashIndex(
      idxs.map(_.bands).reduce(_.unionByName(_)),
      idxs.map(_.sets).reduce(_.unionByName(_)),
      params.head._1, params.head._2)
  }

  /** [[readMinhashSharded]] for the sign-LSH embedding family: the
    * shard union IS an [[Similarity.EmbeddingIndex]] — band keys are
    * per-vector deterministic under (bands, rowBits), so candidate
    * generation and the occupancy guard see exactly the monolithic
    * index's frame. Per-shard blocking drift (possible only through a
    * foreign writer — [[writeEmbedding]] forces one global rowBits)
    * refuses: keys cut in different band spaces never equality-join. */
  def readEmbeddingSharded(spark: SparkSession,
                           home: String): Similarity.EmbeddingIndex = {
    val m = manifest(spark, home)
    require(m("child_kind") == Similarity.EmbeddingIndexKind,
      s"sharded index at $home holds ${m("child_kind")}, not sign-LSH")
    val idxs = shardDirs(home, m).map(Similarity.readEmbeddingIndex(spark, _))
    val params = idxs.map(i => (i.nBands, i.rowBits)).distinct
    require(params.size == 1,
      s"sharded embedding index at $home has drifting per-shard " +
        s"(bands, rowBits) $params — band keys live in different band " +
        "spaces and can never match; rebuild all shards under one " +
        "blocking")
    Similarity.EmbeddingIndex(
      idxs.map(_.bands).reduce(_.unionByName(_)),
      idxs.map(_.vectors).reduce(_.unionByName(_)),
      params.head._1, params.head._2)
  }
}
