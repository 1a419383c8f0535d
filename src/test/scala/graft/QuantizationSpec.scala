package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{exprs, QuantOps}
import graft.operators.Similarity
import graft.sources.Tables

/** Int8 embedding quantization laws: code semantics pinned against a
  * plain-Scala reference, the 4× packing win, ranking recall vs the
  * exact search, and the codegen'd plan shape. */
class QuantizationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("quantize_vec matches the floor(x*levels/maxabs + 0.5) formula") {
    val v = Array(0.31f, -0.77f, 0.001f, -0.0004f, 1.93f)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(exprs.quantize_vec(col("v"), 127)).as[Seq[Int]].head()
    val m = v.map(x => math.abs(x.toDouble)).max
    val expect = v.toSeq.map(x =>
      math.floor(x.toDouble * 127.0 / m + 0.5).toInt)
    assert(got == expect)
    // extremes: the +maxabs element hits +levels exactly; every code
    // is inside the int8 range the packer requires
    assert(got.max == 127 && got.forall(c => c >= -127 && c <= 127))
  }

  test("all-zero vector quantizes to all-zero codes (no div-by-zero)") {
    val got = Seq(Tuple1(Array(0f, 0f, 0f))).toDF("v")
      .select(exprs.quantize_vec(col("v"), 127)).as[Seq[Int]].head()
    assert(got == Seq(0, 0, 0))
  }

  test("pack_codes is 1 byte/dim and dot over packed equals exact int dot") {
    val a = Array(0.5f, -1.5f, 2.5f, 0.25f)
    val b = Array(-0.5f, 1.25f, 0.75f, -2f)
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        exprs.pack_codes(exprs.quantize_vec(col("a"), 127)).as("pa"),
        exprs.pack_codes(exprs.quantize_vec(col("b"), 127)).as("pb"))
      .withColumn("dot", exprs.quantized_dot(col("pa"), col("pb")))
      .head()
    val (pa, pb) = (row.getAs[Array[Byte]]("pa"), row.getAs[Array[Byte]]("pb"))
    assert(pa.length == 4 && pb.length == 4) // 1 byte per dim, not 4
    val expect = pa.zip(pb).map { case (x, y) => x.toLong * y.toLong }.sum
    assert(row.getAs[Long]("dot") == expect)
  }

  test("quantized cosine approximates exact cosine within quant error") {
    // per-element relative error of maxabs-int8 is <= 1/254; on unit-ish
    // random vectors the cosine error stays well under 2e-2
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val d = 16 + rnd.nextInt(48)
      val a = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val b = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
      val qa = QuantOps.packCodes(QuantOps.quantize(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a), 127))
      val qb = QuantOps.packCodes(QuantOps.quantize(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b), 127))
      val exact = {
        var dot = 0d; var na = 0d; var nb = 0d
        (0 until d).foreach { i =>
          dot += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble
          nb += b(i).toDouble * b(i).toDouble
        }
        dot / math.sqrt(na * nb)
      }
      assert(math.abs(QuantOps.qcos(qa, qb) - exact) < 2e-2,
        s"dim=$d quantized cosine drifted past the error bound")
    }
  }

  test("quantizedTopK recall@10 >= 0.9 vs exact brute force") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    def asSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exact = asSets(Similarity.bruteForceTopK(e, q, 10))
    val quant = asSets(Similarity.quantizedTopK(e, q, 10))
    val recalls = exact.map { case (qid, ex) =>
      quant.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9")
  }

  test("ivfTopKQuantized: recall law vs the unquantized IVF board, " +
    "and a generous shortlist recovers it exactly") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val dir = graft.sources.Scratch.dir("ivfq-recall")
    Similarity.writeIvfIndex(e, dir)
    val idx = Similarity.readIvfIndex(spark, dir)
    def asSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val ivfExact = asSets(Similarity.ivfTopKIndexed(idx, q, 10))
    val quant = asSets(Similarity.ivfTopKQuantized(idx, q, 10))
    val recalls = ivfExact.map { case (qid, ex) =>
      quant.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9 vs unquantized IVF")
    // a shortlist spanning the whole probed-cell candidate set makes
    // the quantized cut a no-op: the re-ranked board must EQUAL the
    // unquantized IVF board (exact cosine ranks the same candidates)
    val full = asSets(Similarity.ivfTopKQuantized(idx, q, 10,
      shortlist = e.count().toInt))
    assert(full == ivfExact,
      "full-shortlist quantized board diverged from the unquantized IVF board")
  }

  test("ivfTopKQuantized: scoring scan reads codes only, in probed cells") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = graft.sources.Scratch.dir("ivfq-plan")
    Similarity.writeIvfIndex(e, dir)
    val idx = Similarity.readIvfIndex(spark, dir)
    val qe = Similarity.ivfTopKQuantized(idx, e.filter(col("vec_id") < 5), 10)
      .queryExecution
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val self = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case other => Seq(other)
      }
      self ++ p.children.flatMap(allNodes) ++ p.subqueries.flatMap(allNodes)
    }
    val scans = allNodes(qe.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val assignedScans = scans.filter(
      _.metadata.get("Location").exists(_.contains("assigned")))
    assert(assignedScans.nonEmpty, "no scan of the assigned table found")
    // phase-1 scan: the quantized-scoring read of the assigned table
    // must NOT materialize the float vector column
    val codesScan = assignedScans.find(
      _.schema.fieldNames.contains("codes"))
    assert(codesScan.isDefined, "no codes-column scan of the assigned table")
    assert(!codesScan.get.schema.fieldNames.contains("v"),
      s"quantized scoring scan reads the float column too: " +
        s"${codesScan.get.schema.fieldNames.mkString(",")}")
    // both assigned-table reads carry a partition filter on cent_id
    // (dynamic pruning from the probe/semi joins — the partition
    // column is the join key on both phases)
    assert(assignedScans.forall(s => s.partitionFilters.exists(
      _.references.exists(_.name == "cent_id"))),
      "assigned-table scan lost its cent_id cell pruning")
  }

  test("quantized scoring plan stays in whole-stage codegen") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Similarity.quantizedTopK(e, e.filter(col("vec_id") < 5), 10)
      .queryExecution.executedPlan.toString
    // all four quant expressions codegen via static helpers — a
    // CodegenFallback in the scoring path would show up here
    assert(!plan.contains("CodegenFallback"), "quant path fell out of codegen")
  }

  test("pack_codes rejects codes outside int8 instead of truncating") {
    intercept[Exception] {
      Seq(Tuple1(Array(200))).toDF("c")
        .select(exprs.pack_codes(col("c"))).head()
    }
  }
}
