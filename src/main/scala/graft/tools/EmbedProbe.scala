package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused growth probe for the banded sign-LSH embedding-dedup path —
  * the one plan PROBE_r13 flagged as mildly superlinear (banded
  * candidates 1.156/copy at 30 copies). The full [[ScaleProbe]] reports
  * one aggregate candidate count; this tool decomposes it so the growth
  * law can be PINNED rather than eyeballed:
  *
  *  - within-copy vs cross-copy candidate pairs (copy = id / OFF): a
  *    content-disjoint replication must produce ~zero cross-copy
  *    candidates beyond random bucket collisions — a large cross-copy
  *    share means the per-copy perturbation is correlated under the
  *    LSH lattice and the probe is measuring its own data generator,
  *    not the plan;
  *  - bucket-occupancy skew κ = E[occ²] / (B · E[occ]) per copy count —
  *    the factor the `docs/SCALING.md` candidate bound is linear in: if
  *    κ is flat while n grows, Σ C(occ,2) is linear in n and the plan
  *    is safe at any scale.
  *
  * Usage: runMain graft.tools.EmbedProbe [copies ...]   (default 8 31 62)
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_EMBED_PROBE_OUT
  * (optional JSON artifact path).
  */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val copyCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 31, 62)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 1000000000L

    def probe(dir: String, copies: Int): String = {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val rb = graft.operators.Similarity.autoRowBits(n)
      val banded = graft.operators.Similarity.withBandKeys(
        e, graft.operators.Similarity.DefaultBands, rb)
      // occupancy stats straight off the band keys (pre-candidate):
      // mean/max occupancy over nonempty buckets and the skew factor
      // κ = E[occ²]/E[occ]² the linear candidate bound carries
      val occStats = banded
        .groupBy("band_idx", "band_key").agg(count(lit(1)).as("occ"))
        .agg(avg("occ").as("meanOcc"), max("occ").as("maxOcc"),
          (avg(col("occ") * col("occ")) / (avg("occ") * avg("occ")))
            .as("kappa"))
        .head()
      val cand = graft.operators.Similarity.embeddingCandidates(banded)
        .select(col("id_a"), col("id_b"))
        .withColumn("sameCopy",
          (col("id_a") / OFF).cast("long") === (col("id_b") / OFF).cast("long"))
        .groupBy("sameCopy").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val within = cand.getOrElse(true, 0L)
      val cross = cand.getOrElse(false, 0L)
      val line = f"""{"copies":$copies,"n":$n,"rowBits":$rb,""" +
        f""""within":$within,"cross":$cross,""" +
        f""""meanOcc":${occStats.getDouble(0)}%.2f,"maxOcc":${occStats.getLong(1)},""" +
        f""""kappa":${occStats.getDouble(2)}%.3f}"""
      println(s"[embedprobe] $line")
      line
    }

    // 1x reference straight from the base dir
    val base1 = probe(base, 1)
    val lines = copyCounts.map { c =>
      val out = graft.sources.Scratch.dir(s"embedprobe${c}x")
      buildEmbeddings(spark, base, out, c)
      probe(out, c)
    }
    val json = (base1 +: lines).mkString("""{"metric":"embed_probe","points":[""", ",", "]}")
    println(json)
    sys.env.get("SPARK_GRAFT_EMBED_PROBE_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }

  /** Replicates ONLY the embeddings table (the probed plan touches
    * nothing else) with [[ScaleProbe.buildScaled]]'s exact embedding
    * perturbation — same OFF, same per-copy transform — so findings here
    * transfer 1:1 to the driver's full probe. */
  private[graft] def buildEmbeddings(spark: SparkSession, base: String,
                                     out: String, copies: Int): Unit = {
    val OFF = 1000000000L
    (0 until copies).map { i =>
      ScaleProbe.perturbEmbeddings(
        spark.read.parquet(s"$base/embeddings.parquet")
          .withColumn("vec_id", col("vec_id") + lit(i * OFF)), i)
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }
}
