package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.HadoopBridge

/** Disaster recovery for persisted index homes — the lifecycle piece
  * every other piece assumes exists: leases fence concurrent writers,
  * pointer commits survive crashes, fsck finds torn state, but none of
  * them survives the STORAGE failing (a deleted bucket prefix, a bad
  * retention script, an operator `rm`). A backup is a byte-for-byte,
  * checksummed copy of the home tree; a restore is the inverse, gated
  * on every checksum re-verifying — so "restore serves bit-exactly
  * what the home served at backup time" is a mechanical consequence,
  * not a hope.
  *
  * Works on ANY home layout this engine writes — flat legacy,
  * version-pointer ([[Dedup]] doc at `PointerFile`), and sharded
  * ([[ShardedIndex]]) homes, whose shard children are themselves
  * pointer homes — because it copies the TREE rather than
  * re-serializing tables through a reader (which would need per-kind
  * code and could silently normalize exactly the torn state a backup
  * must preserve evidence of). Two exclusions: the home's `LEASE`
  * file (it is OUR lease during the copy — restoring it would wedge
  * the restored home until the TTL) and `_staging_*` scratch trees
  * (CDC routing residue, never part of served state).
  *
  * Backup layout (all under `backupDir`):
  *   - `data/<relpath>` — the copied tree;
  *   - `_manifest/` — parquet (relpath, length, md5): the integrity
  *     contract, written from checksums computed DURING the copy;
  *   - `_BACKUP_META` — provenance (source home, file/byte counts);
  *   - `_COMMITTED` — the marker, strictly last: a backup without it
  *     is torn and [[restore]] refuses it by name.
  *
  * Consistency: the copy runs under the home's writer lease
  * ([[IndexLease.withLease]]) — the same single-writer fence every
  * maintenance op takes — so no append/CDC/compact can move markers or
  * swing pointers mid-copy; the backup is a frozen, openable snapshot.
  *
  * Scale: the copy is file-granular and runs ON EXECUTORS
  * ([[HadoopBridge.mapWithConf]] ships the driver's filesystem conf),
  * one stream per file with the MD5 folded into the same pass — cost
  * ∝ home bytes with cluster-wide IO parallelism, never a driver
  * bottleneck; driver-side state is the FILE LIST (metadata-scale,
  * the same bound every maintenance op already accepts). For a
  * sharded home, backing up shard children individually (each is a
  * complete home) bounds the unit further — this op doesn't special-
  * case it because `backup(shardDir)` already IS that. */
object IndexBackup {

  private[graft] val MetaFile = "_BACKUP_META"
  private[graft] val MarkerFile = "_COMMITTED"
  private val DataDir = "data"
  private val ManifestDir = "_manifest"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive relative file list under `root`, excluding the lease
    * file and `_staging_*` scratch trees. Driver-side, bounded by the
    * home's file count. */
  private def listRel(fs: FileSystem, root: Path): Seq[String] = {
    def walk(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val name = st.getPath.getName
        val childRel = if (rel.isEmpty) name else s"$rel/$name"
        if (name.startsWith("_staging_")) Seq.empty
        else if (st.isDirectory) walk(st.getPath, childRel)
        else if (name == Dedup.LeaseFile) Seq.empty
        else Seq(childRel)
      }
    walk(root, "")
  }

  /** Copy ONE file `srcRoot/rel` → `dstRoot/rel`, streaming the bytes
    * through MD5 in the same pass. Static + conf-parameterized so it
    * serializes into executor tasks. Returns (rel, length, md5hex). */
  private def streamDigest(conf: Configuration, srcRoot: String, rel: String,
                           dst: Option[Path]): (String, Long, String) = {
    val src = new Path(s"$srcRoot/$rel")
    val md = java.security.MessageDigest.getInstance("MD5")
    val in = src.getFileSystem(conf).open(src)
    val out = dst.map(p => p.getFileSystem(conf).create(p, true))
    var n = 0L
    try {
      val buf = new Array[Byte](1 << 20)
      var read = in.read(buf)
      while (read >= 0) {
        if (read > 0) {
          md.update(buf, 0, read)
          out.foreach(_.write(buf, 0, read))
          n += read
        }
        read = in.read(buf)
      }
    } finally {
      // close the SINK first: if in.close() threw first, the output
      // stream (and a partially-written dest file handle) would leak
      try out.foreach(_.close()) finally in.close()
    }
    (rel, n, md.digest().map("%02x".format(_)).mkString)
  }

  private def copyWithMd5(conf: Configuration, srcRoot: String,
                          dstRoot: String, rel: String)
      : (String, Long, String) =
    streamDigest(conf, srcRoot, rel, Some(new Path(s"$dstRoot/$rel")))

  /** MD5 + length of ONE existing file — the read-only verify twin of
    * [[copyWithMd5]]. */
  private def md5Of(conf: Configuration, root: String, rel: String)
      : (String, Long, String) =
    streamDigest(conf, root, rel, None)

  private def writeSmall(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def parallelism(spark: SparkSession): Int =
    spark.sparkContext.defaultParallelism

  /** Back up the index home at `dir` into `backupDir`. Refuses a
    * COMMITTED backup already at `backupDir` (overwriting the last
    * good backup is a deliberate-delete decision — remove it
    * explicitly); a torn one (no marker — a crashed prior attempt,
    * which nothing ever reads) is cleared and redone. Returns the
    * manifest (relpath, length, md5). */
  def backup(spark: SparkSession, dir: String,
             backupDir: String): DataFrame = {
    val sfs = fsOf(spark, dir)
    // source existence BEFORE the lease: IndexLease.acquire mkdirs the
    // dir it leases (first-write-on-a-new-home behavior), so checking
    // inside the lease could never fail — and a typo'd source path
    // would be silently CREATED by its own refusal path
    require(sfs.exists(new Path(dir)),
      s"IndexBackup.backup: no index home at $dir")
    val bfs = fsOf(spark, backupDir)
    val broot = new Path(backupDir)
    // a backup location inside the home would make every later backup
    // re-copy the earlier ones (listRel excludes only LEASE and
    // _staging_*) — geometric growth and stale backup trees inside a
    // restore; refuse the nesting outright
    val qDir = sfs.makeQualified(new Path(dir)).toString
    val qBk = bfs.makeQualified(broot).toString
    require(qBk != qDir && !qBk.startsWith(qDir + "/"),
      s"IndexBackup.backup: backup location $backupDir is INSIDE the " +
        s"home $dir — each backup would re-copy all previous ones; " +
        "back up beside the home, never under it")
    if (bfs.exists(new Path(broot, MarkerFile)))
      throw new IllegalArgumentException(
        s"IndexBackup.backup: $backupDir already holds a COMMITTED " +
          "backup — overwriting the last good copy is a deliberate " +
          "delete; remove the directory explicitly and re-run")
    if (bfs.exists(broot)) bfs.delete(broot, true) // torn prior attempt
    // a sharded home's SHARD-LOCALIZED maintenance (a plan row
    // compacting home/shard=3) leases only the child dir, so the
    // home-level lease alone would not freeze it mid-copy — take the
    // children's leases too, innermost-last, for the whole copy
    val leaseDirs = dir +: (scala.util.Try(Dedup.readMeta(spark, dir))
      .toOption.filter(_.get("kind").contains(ShardedIndex.Kind))
      .map(m => (0 until m("shards").toInt)
        .map(ShardedIndex.shardDir(dir, _)))
      .getOrElse(Seq.empty))
    def withAll[T](ds: Seq[String])(body: => T): T = ds match {
      case Seq() => body
      case head +: tail =>
        IndexLease.withLease(spark, head, "IndexBackup.backup")(
          withAll(tail)(body))
    }
    withAll(leaseDirs) {
      val rels = listRel(sfs, new Path(dir)).sorted
      require(rels.nonEmpty,
        s"IndexBackup.backup: $dir holds no files — not an index home")
      val dataRoot = s"$backupDir/$DataDir"
      val copied = HadoopBridge.mapWithConf(spark, rels,
        parallelism(spark))(copyWithMd5(_, dir, dataRoot, _))
      import spark.implicits._
      val manifest = copied.toDF("relpath", "length", "md5")
        .repartition(1).sortWithinPartitions("relpath")
      manifest.write.mode("overwrite")
        .parquet(s"$backupDir/$ManifestDir")
      writeSmall(bfs, new Path(broot, MetaFile),
        s"source=$dir\nfiles=${copied.length}\n" +
          s"bytes=${copied.map(_._2).sum}\n")
      // marker strictly last: everything above can crash and leave a
      // tree restore refuses by name
      writeSmall(bfs, new Path(broot, MarkerFile), "committed\n")
      spark.read.parquet(s"$backupDir/$ManifestDir")
    }
  }

  /** Integrity report for the backup at `backupDir` — (check, status,
    * detail) rows in the [[IndexAudit.audit]] style: `marker`,
    * `manifest`, `files` (missing/extra vs the manifest), `bytes` and
    * `checksum` (every file re-hashed, on executors). Read-only; ends
    * with a `verdict` row. */
  def verify(spark: SparkSession, backupDir: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, backupDir)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val committed = fs.exists(new Path(backupDir, MarkerFile))
    rows += (("marker", if (committed) "OK" else "ERROR",
      if (committed) "backup is committed"
      else s"no $MarkerFile — the backup writer crashed before commit; " +
        "delete this tree and re-run IndexBackup.backup"))
    val manifest: Seq[(String, Long, String)] =
      scala.util.Try(
        spark.read.parquet(s"$backupDir/$ManifestDir")
          .select("relpath", "length", "md5")
          .as[(String, Long, String)].collect().toSeq
      ).getOrElse(Seq.empty)
    rows += (("manifest",
      if (manifest.nonEmpty) "OK" else "ERROR",
      if (manifest.nonEmpty) s"${manifest.length} files manifested"
      else "manifest missing or unreadable"))
    if (manifest.nonEmpty) {
      val dataRoot = s"$backupDir/$DataDir"
      val present =
        if (fs.exists(new Path(dataRoot)))
          listRel(fs, new Path(dataRoot)).toSet
        else Set.empty[String]
      val wanted = manifest.map(_._1).toSet
      val missing = (wanted -- present).toSeq.sorted
      val extra = (present -- wanted).toSeq.sorted
      rows += (("files",
        if (missing.isEmpty && extra.isEmpty) "OK" else "ERROR",
        if (missing.isEmpty && extra.isEmpty)
          s"${present.size} files present, none extra"
        else s"${missing.length} missing ${missing.take(3).mkString("(", ", ", ")")}, " +
          s"${extra.length} extra ${extra.take(3).mkString("(", ", ", ")")}"))
      val toCheck = manifest.filter(m => present(m._1))
      val got = HadoopBridge.mapWithConf(spark, toCheck.map(_._1),
        parallelism(spark))(md5Of(_, dataRoot, _))
        .map(r => r._1 -> (r._2, r._3)).toMap
      val badLen = toCheck.filter(m => got(m._1)._1 != m._2).map(_._1)
      val badSum = toCheck.filter(m =>
        got(m._1)._1 == m._2 && got(m._1)._2 != m._3).map(_._1)
      rows += (("bytes", if (badLen.isEmpty) "OK" else "ERROR",
        if (badLen.isEmpty) "every length matches"
        else s"${badLen.length} length mismatches " +
          badLen.take(3).mkString("(", ", ", ")")))
      rows += (("checksum", if (badSum.isEmpty) "OK" else "ERROR",
        if (badSum.isEmpty) "every md5 matches"
        else s"${badSum.length} checksum mismatches " +
          badSum.take(3).mkString("(", ", ", ")")))
    }
    val bad = rows.count(_._2 == "ERROR")
    rows += (("verdict", if (bad == 0) "OK" else "ERROR",
      if (bad == 0) "backup is restorable" else s"$bad checks failed"))
    rows.toSeq.toDF("check", "status", "detail")
  }

  /** Restore the backup at `backupDir` into a FRESH home at `dest`.
    * Refuses a torn backup (no marker), any integrity failure (every
    * file re-checksummed against the manifest BEFORE a byte lands),
    * and a non-empty `dest` (restoring over live state is what
    * takedowns and leases exist to prevent — point serving at the
    * restored home by path instead). Control files (`CURRENT`
    * pointers, `_graft_index_meta.properties` commit markers) land
    * strictly AFTER the data files, so a crashed restore leaves a
    * home that fails loudly at open instead of serving a torn tree —
    * delete it and re-run. */
  def restore(spark: SparkSession, backupDir: String,
              dest: String): Unit = {
    val fs = fsOf(spark, backupDir)
    require(fs.exists(new Path(backupDir, MarkerFile)),
      s"IndexBackup.restore: $backupDir has no $MarkerFile — the backup " +
        "is torn (its writer crashed before commit); it must not be " +
        "restored. Use a committed backup, or re-run IndexBackup.backup")
    val report = verify(spark, backupDir)
      .filter(col("status") === "ERROR").collect()
    require(report.isEmpty,
      s"IndexBackup.restore: backup at $backupDir fails integrity: " +
        report.map(r => s"${r.getString(0)}: ${r.getString(2)}")
          .mkString("; ") + " — restoring it would serve corrupt state")
    val dfs = fsOf(spark, dest)
    require(!dfs.exists(new Path(dest)) ||
        dfs.listStatus(new Path(dest)).isEmpty,
      s"IndexBackup.restore: $dest already exists and is non-empty — " +
        "a restore only targets a fresh home (retire or remove the " +
        "existing one explicitly, or restore beside it and repoint)")
    import spark.implicits._
    val manifest = spark.read.parquet(s"$backupDir/$ManifestDir")
      .select("relpath", "length", "md5")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def isControl(rel: String): Boolean = {
      val name = rel.substring(rel.lastIndexOf('/') + 1)
      name == Dedup.PointerFile || name == Dedup.IndexMetaFile
    }
    val dataRoot = s"$backupDir/$DataDir"
    val (control, plain) = manifest.keys.toSeq.sorted.partition(isControl)
    // the copy streams every byte through MD5 anyway — CHECK it
    // against the manifest, so corruption introduced by the restore
    // copy itself (not just by backup-at-rest damage, which the
    // verify pass above catches) is refused instead of served
    def copyChecked(rels: Seq[String]): Unit = {
      val copied = HadoopBridge.mapWithConf(spark, rels,
        parallelism(spark))(copyWithMd5(_, dataRoot, dest, _))
      val bad = copied.filter { case (rel, n, sum) =>
        manifest(rel) != ((n, sum))
      }
      if (bad.nonEmpty) {
        fsOf(spark, dest).delete(new Path(dest), true)
        throw new IllegalStateException(
          s"IndexBackup.restore: ${bad.length} file(s) hashed " +
            s"differently DURING the restore copy than the manifest " +
            s"records ${bad.take(3).map(_._1).mkString("(", ", ", ")")} " +
            s"— the copy path itself corrupted bytes (backup-at-rest " +
            "verified clean); the partial restore at " + dest +
            " was deleted. Re-run, and if it repeats, distrust the " +
            "transport between the backup store and " + dest)
      }
    }
    copyChecked(plain)
    // control files last — the restored home only becomes openable
    // once every data byte is down
    copyChecked(control)
  }

  // ---- scheduled rotation: generations b1, b2, … under one backup
  // home, newest `keep` committed generations retained ----

  private val GenRe = "^b(\\d+)$".r

  private def genDirs(spark: SparkSession, backupHome: String)
      : Seq[(Int, Boolean)] = {
    val fs = fsOf(spark, backupHome)
    val p = new Path(backupHome)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.collect {
      case st if st.isDirectory => st.getPath.getName
    }.collect { case GenRe(n) =>
      (n.toInt,
        fs.exists(new Path(s"$backupHome/b$n", MarkerFile)))
    }.sortBy(_._1)
  }

  /** COMMITTED backup generation numbers at `backupHome`, ascending —
    * torn generations (a crashed [[rotate]], cleaned by the next one)
    * are not restorable and not listed. */
  def generations(spark: SparkSession, backupHome: String): Seq[Int] =
    genDirs(spark, backupHome).collect { case (n, true) => n }

  /** The newest committed generation's path, or None — the artifact
    * [[restoreLatest]] restores. A newer TORN generation never shadows
    * a committed one. */
  def latest(spark: SparkSession, backupHome: String): Option[String] =
    generations(spark, backupHome).lastOption
      .map(n => s"$backupHome/b$n")

  /** Scheduled-backup rotation — the form a maintenance cadence
    * actually runs ([[IndexAudit.applyPlan]] executes `backup` rows
    * through here): writes generation `b<N+1>` (N = the newest
    * existing number, committed or torn, so numbering is monotonic),
    * then prunes — torn generations always (nothing can restore them),
    * committed ones beyond the newest `keep`. The prune runs AFTER the
    * new generation commits, so there is never a moment with fewer
    * committed backups than before the rotation. Returns the new
    * generation's path. */
  def rotate(spark: SparkSession, dir: String, backupHome: String,
             keep: Int = 2): String = {
    require(keep >= 1,
      s"IndexBackup.rotate: keep must be >= 1, got $keep")
    val before = genDirs(spark, backupHome)
    val next = (0 +: before.map(_._1)).max + 1
    val target = s"$backupHome/b$next"
    backup(spark, dir, target)
    val fs = fsOf(spark, backupHome)
    val torn = before.collect { case (n, false) => n }
    val committed = before.collect { case (n, true) => n } :+ next
    val doomed = torn ++ committed.dropRight(keep)
    doomed.foreach { n =>
      fs.delete(new Path(s"$backupHome/b$n"), true)
    }
    target
  }

  /** [[restore]] from the newest committed generation at `backupHome`;
    * returns the generation path restored from. */
  def restoreLatest(spark: SparkSession, backupHome: String,
                    dest: String): String = {
    val g = latest(spark, backupHome).getOrElse(
      throw new IllegalArgumentException(
        s"IndexBackup.restoreLatest: no committed backup generation at " +
          s"$backupHome — run IndexBackup.rotate (a torn generation, if " +
          "present, is a crashed backup and cannot be restored)"))
    restore(spark, g, dest)
    g
  }

  /** Backup-staleness probe for the fleet planner: Some(ageMs) of the
    * newest committed generation's marker, or None when no committed
    * generation exists. */
  private[graft] def latestAgeMs(spark: SparkSession,
                                 backupHome: String): Option[Long] =
    latest(spark, backupHome).map { g =>
      val fs = fsOf(spark, g)
      System.currentTimeMillis() -
        fs.getFileStatus(new Path(g, MarkerFile)).getModificationTime
    }
}
