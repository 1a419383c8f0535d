package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fsck for the persisted index families — the ops tool a 3 a.m. page
  * reaches for BEFORE deciding between `recoverSwap`, replay, and
  * rebuild. Every index in this engine shares the v2 layout discipline
  * (per-table `ingest_batch` partitions, marker-last commits, `tomb/`
  * masking, whole-directory swaps), which means an index's health is
  * DIAGNOSABLE from its files and metadata alone:
  *
  *   - a missing main directory beside a complete `__swap` sibling is
  *     the one crash window reads cannot survive (repair:
  *     [[Dedup.recoverSwap]]);
  *   - a `__swap` sibling beside an INTACT directory is mid-build
  *     residue (safe to delete, never auto-deleted here);
  *   - rows in partitions past the commit marker are a torn append
  *     awaiting its replay (reads already exclude them — informational);
  *   - a declared `n_docs`/`n_vectors` that disagrees with the
  *     recomputed live count means metadata was hand-edited or a
  *     writer violated the single-writer contract — sizing decisions
  *     (occupancy refusals) are now lying;
  *   - an empty-born table (a directory with no written partition, the
  *     insert-only-CDC-batch shape) reads as absent by design.
  *
  * Returns one row per check: (chk, status ∈ OK|WARN|ERROR, detail).
  * Statuses are scale-independent (details carry the counts), so a
  * healthy index audits to a FIXED row set — the `q_index_audit` gate
  * pins it against a literal oracle, the canary pattern. Read-only:
  * the audit never mutates the index, it only names the repair. */
object IndexAudit {

  /** Core tables per index kind (tomb/ and the IVF batch subtree are
    * optional and checked separately). */
  private val layout: Map[String, Seq[String]] = Map(
    "minhash-v2" -> Seq("bands", "sets"),
    "signlsh-v2" -> Seq("bands", "vectors"),
    "prefix_index" -> Seq("sets", "df", "prefix"),
    "bm25_index" -> Seq("postings", "df", "stats"),
    "ivf_index" -> Seq("centroids", "assigned"))

  private val vecKinds = Set("signlsh-v2", "ivf_index")

  def audit(spark: SparkSession, dir: String): DataFrame = {
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    def done(): DataFrame = {
      import spark.implicits._
      rows.toSeq.toDF("chk", "status", "detail")
    }
    val main = new org.apache.hadoop.fs.Path(dir)
    val sib = new org.apache.hadoop.fs.Path(dir + "__swap")
    val fs = main.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(main) && fs.exists(sib)) {
      rows += (("layout", "ERROR",
        "main directory missing with a complete __swap sibling — crash " +
          "inside the delete+rename window; run " +
          s"""graft.operators.Dedup.recoverSwap(spark, "$dir")"""))
      return done()
    }
    if (!fs.exists(main)) {
      rows += (("layout", "ERROR", "directory missing (no sibling either)"))
      return done()
    }
    rows += (("swap_residue",
      if (fs.exists(sib)) "WARN" else "OK",
      if (fs.exists(sib))
        "__swap sibling beside an intact index — stale mid-build " +
          "leftovers from a crashed maintenance run; safe to delete"
      else ""))
    val meta =
      try Dedup.readMeta(spark, dir)
      catch {
        case e: Exception =>
          rows += (("layout", "ERROR",
            s"metadata unreadable: ${e.getMessage}"))
          return done()
      }
    rows += (("layout", "OK", ""))
    val kind = meta.getOrElse("kind", "<absent>")
    layout.get(kind) match {
      case None =>
        rows += (("kind", "ERROR",
          s"unknown kind '$kind' — not an index this engine reads"))
        return done()
      case Some(tables) =>
        rows += (("kind", "OK", kind))
        val marker = Dedup.lastCommittedBatch(meta)
        tables.foreach { t =>
          val p = s"$dir/$t"
          if (!fs.exists(new org.apache.hadoop.fs.Path(p)))
            rows += ((s"table:$t", "ERROR", "missing"))
          else scala.util.Try(spark.read.parquet(p)).toOption match {
            case None =>
              rows += ((s"table:$t", "ERROR",
                "unreadable (no inferable schema — empty-born core table?)"))
            case Some(d) if d.columns.contains(Dedup.IngestBatchCol) =>
              val committed =
                d.filter(col(Dedup.IngestBatchCol) <= marker).count()
              val uncommitted =
                d.filter(col(Dedup.IngestBatchCol) > marker).count()
              rows += ((s"table:$t",
                if (committed > 0) "OK" else "ERROR",
                if (committed > 0) s"committed=$committed"
                else "no committed rows"))
              rows += ((s"uncommitted:$t",
                if (uncommitted == 0) "OK" else "WARN",
                if (uncommitted == 0) ""
                else s"$uncommitted rows in partitions past the marker — " +
                  "a torn append awaiting its replay (reads already " +
                  "exclude them)"))
            case Some(d) =>
              rows += ((s"table:$t", "OK", s"rows=${d.count()}"))
          }
        }
        val idCol = if (vecKinds(kind)) "vec_id" else "doc_id"
        val tombs =
          if (Dedup.indexTableHasData(spark, s"$dir/tomb"))
            Some(Dedup.committedOnly(
              spark.read.parquet(s"$dir/tomb"), meta)
              .select(idCol).distinct())
          else None
        rows += (("tomb", "OK",
          tombs.fold("no tombstones")(t => s"tombstoned=${t.count()}")))
        def liveCount(table: String): Long = {
          val base = Dedup.committedOnly(
            spark.read.parquet(s"$dir/$table"), meta).select(idCol)
          tombs.fold(base)(t => base.join(t, Seq(idCol), "left_anti"))
            .count()
        }
        kind match {
          case "minhash-v2" =>
            val declared = meta("n_docs").toLong
            val live = liveCount("sets")
            rows += (("count",
              if (declared == live) "OK" else "ERROR",
              if (declared == live) s"n_docs=$declared"
              else s"meta n_docs=$declared but live sets hold $live — " +
                "metadata edited or single-writer contract violated; " +
                "rebuild restores truth from the tables"))
          case "signlsh-v2" =>
            val declared = meta("n_vectors").toLong
            val live = liveCount("vectors")
            rows += (("count",
              if (declared == live) "OK" else "ERROR",
              if (declared == live) s"n_vectors=$declared"
              else s"meta n_vectors=$declared but live vectors hold " +
                s"$live — occupancy sizing is lying; rebuild"))
          case "bm25_index" =>
            val fold = scala.util.Try(
              graft.operators.Bm25Index.foldedStats(spark, dir))
            rows += (("stats_fold",
              if (fold.isSuccess) "OK" else "ERROR",
              fold.fold(e => e.getMessage,
                { case (n, s) => s"n=$n s=$s" })))
          case "ivf_index" =>
            rows += (("cell_hist",
              if (meta.contains("cell_hist")) "OK" else "WARN",
              if (meta.contains("cell_hist")) ""
              else "no stored cell histogram — the append drift " +
                "sentinel cannot run; rebuild re-baselines it"))
            if (Dedup.indexTableHasData(spark, s"$dir/assigned_batches")) {
              val b = spark.read.parquet(s"$dir/assigned_batches")
              val uncommitted =
                b.filter(col(Dedup.IngestBatchCol) > marker).count()
              rows += (("uncommitted:assigned_batches",
                if (uncommitted == 0) "OK" else "WARN",
                if (uncommitted == 0) "" else s"$uncommitted rows await " +
                  "their replay (reads already exclude them)"))
            } else
              rows += (("uncommitted:assigned_batches", "OK", ""))
          case _ => ()
        }
    }
    done()
  }
}
