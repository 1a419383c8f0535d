package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`) — SURVEY
  * §2.9: brute-force cosine top-k as the exactness baseline, and a
  * deterministic sign-LSH (random-hyperplane style) bucketing as the
  * scale path (candidates from an equality join on the bucket key).
  *
  * All arithmetic is element-wise float→double with a sequential fold,
  * so a SQL oracle reproduces the exact IEEE result; similarities are
  * rounded to 6 dp and ties broken by id for total determinism.
  */
object Similarity {

  /** cosine(a, b) over `array<float>` — custom codegen'd expression
    * ([[graft.functions.CosineSim]]): double math, sequential
    * accumulation, bit-identical to the SQL oracle's elementwise form. */
  def cosine(a: String, b: String): Column =
    graft.functions.exprs.cosine_sim(col(a), col(b))

  /** Sign-LSH bucket id from `bits` deterministic hyperplane signs
    * (fixed integer lattice w(i,j) = ((i·31 + j·17) % 7) − 3 — no RNG,
    * so every engine computes identical buckets). */
  def withBucket(df: DataFrame, bits: Int): DataFrame =
    df.withColumn("bucket",
      graft.functions.exprs.sign_lsh_bucket(col("embedding"), bits))

  /** Exact top-k neighbours for each query vector (brute force): one
    * broadcast of the query set, one narrow scan of the corpus, one
    * shuffle on query id for the top-k window. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qv")))
    val scored = corpus.select(col("vec_id"), col("embedding").as("v"))
      .join(q, col("qid") =!= col("vec_id"))
      .withColumn("sim", round(cosine("qv", "v"), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }

  /** Approximate top-k: candidates restricted to the query's sign-LSH
    * bucket (equality join on the bucket key — at corpus scale this is
    * the difference between scanning everything per query and probing
    * one bucket). Recall trades off with `bits`. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8): DataFrame = {
    val c = withBucket(corpus.select(col("vec_id"), col("embedding")), bits)
      .select(col("vec_id"), col("embedding").as("v"), col("bucket"))
    val q = broadcast(
      withBucket(queries.select(col("vec_id"), col("embedding")), bits)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("bucket")))
    val scored = c.join(q, Seq("bucket")).filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", round(cosine("qv", "v"), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }

  /** IVF-flat approximate top-k: a fixed coarse quantizer (the first
    * `nCentroids` vectors — deterministic, no trained k-means so the SQL
    * oracle reproduces the partition exactly), each corpus vector
    * assigned to its nearest centroid, queries probing their `nprobe`
    * nearest cells. The 100 TB shape: the corpus is partitioned once by
    * cell; a query touches nprobe/nCentroids of the data. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 2): DataFrame = {
    val cents = broadcast(corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv")))
    def assign(df: DataFrame, idCol: String, vCol: String, keep: Int) = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("csim").desc, col("cent_id").asc)
      df.join(cents, col(idCol) >= 0) // cross with broadcast centroids
        .withColumn("csim", round(cosine(vCol, "cv"), 6))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= keep)
        .drop("cv", "csim", "crn")
    }
    val assigned = assign(
      corpus.select(col("vec_id"), col("embedding").as("v")), "vec_id", "v", 1)
    val probes = assign(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "qid", "qv", nprobe)
    val scored = assigned.join(probes, Seq("cent_id"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", round(cosine("qv", "v"), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }

  /** Near-duplicate vector pairs: sign-LSH blocking then exact cosine ≥
    * cosMin within each bucket. */
  def embeddingPairs(df: DataFrame, bits: Int = 8,
                     cosMin: Double = 0.3): DataFrame = {
    // materialized (localCheckpoint, GC-released — persist() would pin
    // the blocks in the CacheManager for the session lifetime): reused
    // by both sides of the bucket self-join
    val b = withBucket(df.select(col("vec_id"), col("embedding")), bits)
      .localCheckpoint()
    val l = b.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col("bucket"))
    val r = b.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("bucket"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine("va", "vb"), 6))
      .filter(col("cos") >= cosMin)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
