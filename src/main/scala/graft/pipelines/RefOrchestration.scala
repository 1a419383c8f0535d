package graft.pipelines

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables

/** The reference's *scheduler* semantics (`dags/etl.py:148-157`: a daily
  * cron run over whatever input files exist, `catchup=False` at `:154`,
  * retries at `:20-21`) re-expressed Spark-first as a file-arrival
  * incremental driver. One call = one scheduled run:
  *
  *  - the orders FACT feed is a Structured Streaming file source over
  *    `inDir/orders/` drained with `Trigger.AvailableNow` — files that
  *    arrived since the last run are processed exactly once (the
  *    checkpoint's offset log is the `catchup=False`: a re-run never
  *    reprocesses old files, a run after downtime picks up everything
  *    pending, and a run with nothing pending is a no-op);
  *  - each micro-batch is enriched through the UNCHANGED batch plans
  *    ([[RefPipeline.ordersEnriched]] — same join/rename semantics the
  *    correctness gate pins) against the current dimension snapshots,
  *    and lands in its own `ingest_batch=<id>` partition with overwrite
  *    semantics, so foreachBatch's at-least-once replay (the reference's
  *    `retries`) rewrites rather than double-appends — rerun ≡ run-once,
  *    byte-identical;
  *  - the users/products DIMENSION sinks are deterministically fully
  *    refreshed per run, as the reference DAG reloads both tables every
  *    scheduled run.
  *
  * At scale: per-batch volume is the arrival increment (a day of files),
  * not the corpus — the single-partition batch write below is the
  * one-file-per-day layout; swap it for `partitionBy(date)` when an
  * increment outgrows one file. Nothing rescans the held sink.
  */
object RefOrchestration {

  /** What one scheduled run did: micro-batches drained and enriched
    * orders rows appended (0/0 = the no-op re-run). */
  final case class RunSummary(batches: Long, ordersRows: Long)

  private val payloadCols =
    Seq("Fecha", "User_ID", "Product_ID", "Product_Name", "Category", "Price")

  /** One scheduled run: refresh dimension sinks, drain pending fact
    * files, append enriched batches idempotently. Layout contract:
    * inDir holds `orders/` (arriving csv files), `products.csv`,
    * `users.csv`, `user_info.json`; outDir gains `orders/ingest_batch=N`,
    * `users`, `products`, `_checkpoint`. */
  def runIncremental(spark: SparkSession, inDir: String,
                     outDir: String): RunSummary = {
    val products = Tables.csv(spark, s"$inDir/products.csv", Tables.refProductsSchema)
    val users = Tables.csv(spark, s"$inDir/users.csv", Tables.refUsersSchema)
    val userInfo = Tables.userInfoJson(spark, s"$inDir/user_info.json")
    val usersFinal = RefPipeline.usersEnriched(users, userInfo)

    writeSorted(RefPipeline.productsPassthrough(products),
      Seq("Id"), s"$outDir/products")
    writeSorted(usersFinal, Seq("Id"), s"$outDir/users")

    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(Tables.refOrdersSchema)
      .option("header", "true")
      .csv(s"$inDir/orders")
      .writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val part = s"$outDir/orders/ingest_batch=$batchId"
        // row count rides the write job itself (Observation) — the
        // footer-count read-back this replaces was one extra Spark job
        // per micro-batch, counting rows the write had just streamed
        val obs = org.apache.spark.sql.Observation()
        writeSorted(RefPipeline.ordersEnriched(batch, products, usersFinal)
          .observe(obs, count(lit(1)).as("n")), payloadCols, part)
        batches.incrementAndGet()
        rows.addAndGet(obs.get("n").asInstanceOf[Long])
        ()
      }
      .start()
    q.awaitTermination()
    RunSummary(batches.get, rows.get)
  }

  /** The enriched-orders sink as a DataFrame, `ingest_batch` replay
    * bookkeeping projected away. */
  def readOrdersSink(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/orders")
      .select(payloadCols.map(col): _*)

  /** Deterministic sink write: one fully-sorted file, so identical input
    * always produces identical bytes (the rerun-idempotence law is
    * checked at the file level, not just row sets). */
  private def writeSorted(df: DataFrame, by: Seq[String], path: String): Unit =
    df.repartition(1).sortWithinPartitions(by.map(col): _*)
      .write.mode("overwrite").parquet(path)

  // ---- gate/test fixture derivation --------------------------------------

  /** Derives reference-SHAPED inputs deterministically from the testdata
    * star schema (the gate convention: every lifecycle gate's inputs come
    * from the sf tables so the DuckDB oracle can replay them): facts from
    * lineitem (Fecha = shipdate day, Product_ID = partkey, User_ID =
    * suppkey), products from part, users + user_info from supplier with
    * gender/birthday variants that exercise P5/P6 normalization. Facts
    * are split by `l_orderkey % chunks` so tests stage multi-run
    * arrivals. All files land via a Spark writer + rename (the
    * distributed arrival pattern), never a driver collect. */
  private[graft] def stageDims(spark: SparkSession, sfDir: String,
                               inDir: String): Unit = {
    stageCsv(Tables.part(spark, sfDir)
      .select(col("p_partkey").as("Id"), col("p_name").as("Name"),
        col("p_brand").as("Category"),
        col("p_size").cast("long").as("Price")),
      s"$inDir/products.csv")
    stageCsv(Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("Id"),
        (col("s_suppkey") + 100000L).as("Document")),
      s"$inDir/users.csv")
    // one multiLine JSON document {status, data:[...]} — the S2 shape
    val doc = Tables.supplier(spark, sfDir)
      .select(struct(
        (col("s_suppkey") + 100000L).as("document"),
        col("s_name").as("name"),
        concat(lit("199"), (col("s_suppkey") % 10).cast("string"),
          lit("-01-02T00:00:00")).as("birthday"),
        when(col("s_suppkey") % 3 === 0, "Male")
          .when(col("s_suppkey") % 3 === 1, "f")
          .otherwise("F").as("gender"),
        concat(col("s_name"), lit("@x.com")).as("email"),
        col("s_suppkey").cast("string").as("phone")).as("r"))
      .agg(to_json(struct(lit(200L).as("status"),
        collect_list(col("r")).as("data"))).as("j"))
    stageText(doc.select(col("j")), s"$inDir/user_info.json")
  }

  /** Stages fact chunk `k` of `chunks` as one arriving CSV file under
    * `inDir/orders/` — call once per simulated scheduled interval. */
  private[graft] def stageFactChunk(spark: SparkSession, sfDir: String,
                                    inDir: String, k: Int,
                                    chunks: Int = 2): Unit =
    stageCsv(Tables.lineitem(spark, sfDir)
      .filter(pmod(col("l_orderkey"), lit(chunks)) === k)
      .select(date_format(col("l_shipdate"), "yyyy-MM-dd").as("Fecha"),
        col("l_partkey").as("Product_ID"),
        col("l_suppkey").as("User_ID")),
      s"$inDir/orders/chunk$k.csv")

  private def stageCsv(df: DataFrame, dest: String): Unit =
    stageMove(dest, tmp => df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(tmp), ".csv")

  private def stageText(df: DataFrame, dest: String): Unit =
    stageMove(dest, tmp => df.coalesce(1).write.mode("overwrite").text(tmp),
      ".txt")

  /** Write through a scratch dir, then rename the single part file to
    * `dest` — the atomic-arrival idiom (a half-written file is never
    * visible under the watched directory). */
  private def stageMove(dest: String, write: String => Unit,
                        ext: String): Unit = {
    val tmp = graft.sources.Scratch.dir(
      s"stage_${java.util.UUID.randomUUID.toString.take(8)}")
    write(tmp)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(ext))
      .findFirst.orElseThrow(() =>
        new IllegalStateException(s"no part file in $tmp"))
    val destPath = java.nio.file.Paths.get(dest)
    java.nio.file.Files.createDirectories(destPath.getParent)
    java.nio.file.Files.move(part, destPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
