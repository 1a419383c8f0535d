package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.RefOrchestration
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Laws for the file-arrival incremental driver (the reference DAG's
  * scheduler semantics, `dags/etl.py:148-157`): exactly-once pickup of
  * arrived files across runs, no-op on an idle re-run (`catchup=False`),
  * and byte-level determinism of every sink so a retried/replayed run is
  * indistinguishable from the first. The incremental ≡ batch value law
  * is gated in CORRECTNESS (`ref_pipeline_incremental` vs the DuckDB
  * one-shot join); this spec pins the orchestration behaviors the oracle
  * can't see. */
class RefOrchestrationSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** file name → md5 of contents for every regular file under dir,
    * excluding the checkpoint (offset logs are run bookkeeping). */
  private def inventory(dir: String): Map[String, String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Map.empty
    else Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !root.relativize(p).toString.contains("_checkpoint"))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("MD5")
        root.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }

  private def freshRoot(): (String, String) = {
    val root = Files.createTempDirectory("refpipe-spec")
    (s"$root/in", s"$root/out")
  }

  test("arrived files are processed exactly once; idle re-run is a byte-level no-op") {
    val (in, out) = freshRoot()
    RefOrchestration.stageDims(spark, sf, in)
    RefOrchestration.stageFactChunk(spark, sf, in, 0)
    val r1 = RefOrchestration.runIncremental(spark, in, out)
    assert(r1.batches == 1 && r1.ordersRows > 0)

    RefOrchestration.stageFactChunk(spark, sf, in, 1)
    val r2 = RefOrchestration.runIncremental(spark, in, out)
    assert(r2.batches == 1, "second run must process ONLY the new chunk")

    val ordersAfter2 = inventory(s"$out/orders")
    assert(ordersAfter2.keys.exists(_.contains("ingest_batch=0")) &&
      ordersAfter2.keys.exists(_.contains("ingest_batch=1")),
      s"expected two batch partitions, got ${ordersAfter2.keys}")

    // idle third run: no batches, orders sink untouched byte-for-byte,
    // dimension refresh rewrites identical bytes (determinism law)
    val dimsBefore = (inventory(s"$out/users"), inventory(s"$out/products"))
    val r3 = RefOrchestration.runIncremental(spark, in, out)
    assert(r3 == RefOrchestration.RunSummary(0, 0),
      s"idle re-run did work: $r3 — catchup=False law broken")
    assert(inventory(s"$out/orders") == ordersAfter2,
      "idle re-run changed the orders sink")
    val dimsAfter = (inventory(s"$out/users"), inventory(s"$out/products"))
    // names carry writer UUIDs — compare content hashes
    assert(dimsBefore._1.values.toSeq.sorted == dimsAfter._1.values.toSeq.sorted,
      "users dimension refresh is not byte-deterministic")
    assert(dimsBefore._2.values.toSeq.sorted == dimsAfter._2.values.toSeq.sorted,
      "products dimension refresh is not byte-deterministic")

    // value law: two incremental runs == one-shot batch over both chunks
    val (inB, outB) = freshRoot()
    RefOrchestration.stageDims(spark, sf, inB)
    RefOrchestration.stageFactChunk(spark, sf, inB, 0)
    RefOrchestration.stageFactChunk(spark, sf, inB, 1)
    val rB = RefOrchestration.runIncremental(spark, inB, outB)
    assert(rB.batches == 1, "both pending files should drain in one batch")
    val inc = RefOrchestration.readOrdersSink(spark, out)
    val oneShot = RefOrchestration.readOrdersSink(spark, outB)
    assert(inc.count() == r1.ordersRows + r2.ordersRows)
    assert(inc.exceptAll(oneShot).isEmpty && oneShot.exceptAll(inc).isEmpty,
      "incremental sink != one-shot sink")
  }

  test("users sink: gender normalized (P5) and birthday ISO-truncated (P6)") {
    val (in, out) = freshRoot()
    RefOrchestration.stageDims(spark, sf, in)
    RefOrchestration.stageFactChunk(spark, sf, in, 0)
    RefOrchestration.runIncremental(spark, in, out)
    val users = spark.read.parquet(s"$out/users")
    assert(users.count() > 0)
    val genders = users.select("Gender").distinct()
      .collect().map(_.getString(0)).toSet
    assert(genders.subsetOf(Set("M", "F")),
      s"staged Male/f/F must normalize to M/F, got $genders")
    val bad = users.filter(!org.apache.spark.sql.functions.col("BirthDay")
      .rlike("^\\d{4}-\\d{2}-\\d{2}$")).count()
    assert(bad == 0, s"$bad BirthDay values not ISO-day-truncated")
  }
}
