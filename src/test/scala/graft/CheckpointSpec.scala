package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Reliable-checkpoint lifecycle (the cluster-mode path of
  * `Dedup.materializeTracked`, which local runs never hit because no
  * checkpoint dir is configured):
  *
  *  - cleanup deletes EXACTLY its own generation — a concurrent
  *    checkpoint written by another job on the same session must
  *    survive (the old listing-diff implementation would have deleted
  *    it);
  *  - the iterative clusterer leaves only the final labels generation
  *    behind (p, edges, and every superseded generation reclaimed);
  *  - the non-convergence error path reclaims everything.
  */
class CheckpointSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Runs `body` with a FRESH checkpoint dir on the shared context, then
    * restores the no-checkpoint-dir default so suite order can't change
    * other suites' materialize behavior. Returns (result, rdd dirs left). */
  private def withCheckpointDir[A](name: String)(body: => A): (A, Seq[String]) = {
    val dir = Files.createDirectories(
      Paths.get(graft.sources.Scratch.dir("ckpt"), name)).toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val out = body
      // setCheckpointDir nests a random subdir under the given path
      (out, rddDirsUnder(Paths.get(dir)))
    } finally org.apache.spark.graftbridge.CheckpointBridge
      .clearCheckpointDir(spark.sparkContext)
  }

  private def rddDirsUnder(root: Path): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    scala.util.Using.resource(Files.walk(root)) { st =>
      st.forEach(p => if (Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("rdd-")) out += p.toString)
    }
    out.toSeq
  }

  test("cleanup deletes its own generation only; concurrent checkpoints survive") {
    val ((other, ownBefore), left) = withCheckpointDir("concurrent") {
      val (cp, cleanup) = Dedup.materializeTracked(
        Seq(1, 2, 3).toDF("x"))
      assert(cp.count() == 3) // readable while its files live
      // a concurrent checkpoint from another thread/job on the session
      val other = Seq(4, 5).toDF("y").checkpoint()
      val ownBefore = spark.sparkContext.getCheckpointDir
        .map(d => rddDirsUnder(Paths.get(new java.net.URI(d))).size)
      cleanup()
      (other, ownBefore)
    }
    // before cleanup: both generations on disk; after: exactly the
    // concurrent one remains, and it is still fully readable
    assert(ownBefore.contains(2))
    assert(left.size == 1, s"expected only the concurrent rdd dir, got $left")
    assert(other.count() == 2)
  }

  test("duplicateClusters leaves only the final labels generation on disk") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (rows, left) = withCheckpointDir("clusters") {
      Dedup.duplicateClusters(chain, maxRounds = 20, smallGraphThreshold = 0L)
        .as[(Long, Long)].collect().toMap
    }
    assert(rows.size == 13 && rows.values.forall(_ == 0L))
    assert(left.size == 1,
      s"p/edges/superseded generations must be reclaimed, found $left")
  }

  test("duplicateClusters small-graph path reclaims the pairs checkpoint") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val (rows, left) = withCheckpointDir("smallgraph") {
      Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toMap
    }
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(left.isEmpty, s"expected no checkpoint leftovers, found $left")
  }

  test("non-convergence error path reclaims every generation") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (err, left) = withCheckpointDir("nonconverged") {
      intercept[IllegalStateException] {
        Dedup.duplicateClusters(chain, maxRounds = 2, smallGraphThreshold = 0L)
      }
    }
    assert(err.getMessage.contains("did not converge"))
    assert(left.isEmpty, s"error path must reclaim all checkpoints, found $left")
  }
}
