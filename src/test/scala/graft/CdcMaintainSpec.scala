package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Maintain
import graft.streaming.StreamOps

/** CDC (insert/delete change-stream) maintenance laws for the agg and
  * quantile legs — the streaming twins of the signed-retraction folds:
  * stream ≡ batch ≡ one-shot over live rows, marker-guarded replay
  * idempotence, loud refusal of over-retraction and malformed ops.
  * (Batch-side retraction laws live in RetractionMaintainSpec; the
  * top-k leg's CDC laws in MaintainTopKQualitySpec.) */
class CdcMaintainSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def orders = graft.sources.Tables.orders(spark, sf)

  private def aggRows(df: DataFrame): Set[(String, Long, Double)] =
    df.select(col("o_orderstatus"), col("cnt").cast("long"),
      col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet

  /** The CDC fixture every test shares: state = 90% base; the change
    * stream inserts the held-out 10% (minus its 7≡3 rows) and deletes
    * the base's 7≡3 row images → live set = orders with key%7≠3. */
  private def writeCdc(root: String): Unit = {
    val base = orders.filter(col("o_orderkey") % 10 =!= 0)
    val inserts = orders.filter(col("o_orderkey") % 10 === 0 &&
        col("o_orderkey") % 7 =!= 3)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .withColumn("op", lit("insert"))
    val deletes = base.filter(col("o_orderkey") % 7 === 3)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .withColumn("op", lit("delete"))
    inserts.unionByName(deletes).repartition(3)
      .write.mode("overwrite").parquet(s"$root/cdc")
  }

  private def cdcStream(root: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(s"$root/cdc").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/cdc")

  test("agg CDC stream over 3 micro-batches ≡ one-shot over live rows") {
    val root = graft.sources.Scratch.dir("cdc-agg-law")
    Maintain.writeAggCdcState(orders.filter(col("o_orderkey") % 10 =!= 0),
      "o_orderstatus", "o_totalprice", s"$root/state")
    writeCdc(root)
    StreamOps.maintainAggCdcStream(cdcStream(root), "o_orderstatus",
      "o_totalprice", "op", s"$root/state", s"$root/ckpt").stop()
    val live = orders.filter(col("o_orderkey") % 7 =!= 3)
    val expected = aggRows(Maintain.aggPartials(live,
      "o_orderstatus", "o_totalprice"))
    assert(expected.nonEmpty)
    assert(aggRows(Maintain.readAggCdcState(spark, s"$root/state"))
      == expected, "streamed CDC fold diverged from the one-shot aggregate")
    // replaying a committed batchId is a marker no-op — fold the whole
    // stream content again as batch 0 (≤ marker 2): state frozen
    Maintain.foldAggStateWithDeletes(spark, s"$root/state",
      spark.read.parquet(s"$root/cdc").filter(col("op") === "insert"),
      spark.read.parquet(s"$root/cdc").filter(col("op") === "delete"),
      "o_orderstatus", "o_totalprice", batchId = Some(0L))
    assert(aggRows(Maintain.readAggCdcState(spark, s"$root/state"))
      == expected, "replayed committed batch moved the state")
  }

  test("quantile CDC stream ≡ one-shot binning of live rows") {
    val root = graft.sources.Scratch.dir("cdc-qh-law")
    Maintain.writeQuantileState(orders.filter(col("o_orderkey") % 10 =!= 0),
      "o_orderstatus", "o_totalprice", s"$root/state",
      lo = 0.0, hi = 600000.0, bins = 120)
    writeCdc(root)
    StreamOps.maintainQuantileCdcStream(cdcStream(root), "o_orderstatus",
      "o_totalprice", "op", s"$root/state", s"$root/ckpt").stop()
    def est(state: DataFrame): Set[(String, Double, Long, Double)] =
      Maintain.estimateQuantiles(state, "o_orderstatus", Seq(0.5, 0.9),
        lo = 0.0, hi = 600000.0, bins = 120)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
          r.getDouble(3))).toSet
    val oneShotDir = graft.sources.Scratch.dir("cdc-qh-oneshot")
    Maintain.writeQuantileState(orders.filter(col("o_orderkey") % 7 =!= 3),
      "o_orderstatus", "o_totalprice", s"$oneShotDir/state",
      lo = 0.0, hi = 600000.0, bins = 120)
    val expected = est(Maintain.readQuantileState(spark, s"$oneShotDir/state"))
    assert(expected.nonEmpty)
    assert(est(Maintain.readQuantileState(spark, s"$root/state")) == expected,
      "streamed histogram fold diverged from one-shot binning of live rows")
    // the domain travels with the state
    assert(Maintain.readQuantileDomain(spark, s"$root/state")
      == (0.0, 600000.0, 120))
  }

  test("over-retraction refuses loudly and leaves the state untouched") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("cdc-agg-over")
    val base = Seq(("A", 10.0), ("A", 20.0), ("B", 5.0))
      .toDF("k", "v")
    Maintain.writeAggCdcState(base, "k", "v", s"$root/state")
    val before = aggRows(Maintain.readAggCdcState(spark, s"$root/state")
      .withColumnRenamed("k", "o_orderstatus"))
    val phantom = Seq(("B", 5.0), ("B", 5.0)).toDF("k", "v") // only one held
    val ex = intercept[Exception] {
      Maintain.foldAggStateWithDeletes(spark, s"$root/state",
        spark.emptyDataset[(String, Double)].toDF("k", "v"),
        phantom, "k", "v", batchId = Some(0L))
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("retraction exceeds")),
      s"wrong refusal: ${msgs(ex).take(3)}")
    assert(aggRows(Maintain.readAggCdcState(spark, s"$root/state")
      .withColumnRenamed("k", "o_orderstatus")) == before,
      "refused fold mutated the state")
  }

  test("unknown and NULL op values refuse loudly") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("cdc-agg-badop")
    Maintain.writeAggCdcState(Seq(("A", 1.0)).toDF("k", "v"),
      "k", "v", s"$root/state")
    Seq(("A", 2.0, "upsert")).toDF("k", "v", "op")
      .write.mode("overwrite").parquet(s"$root/cdc")
    val ex = intercept[Exception] {
      StreamOps.maintainAggCdcStream(
        spark.readStream.schema(spark.read.parquet(s"$root/cdc").schema)
          .parquet(s"$root/cdc"),
        "k", "v", "op", s"$root/state", s"$root/ckpt")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(c => Option(c.getMessage)).toSeq
    assert(chain(ex).exists(_.contains("unknown op value")),
      s"refusal lost in: ${chain(ex).mkString(" | ")}")
    val root2 = graft.sources.Scratch.dir("cdc-agg-nullop")
    Maintain.writeAggCdcState(Seq(("A", 1.0)).toDF("k", "v"),
      "k", "v", s"$root2/state")
    Seq(("A", 2.0, null.asInstanceOf[String])).toDF("k", "v", "op")
      .write.mode("overwrite").parquet(s"$root2/cdc")
    val ex2 = intercept[Exception] {
      StreamOps.maintainAggCdcStream(
        spark.readStream.schema(spark.read.parquet(s"$root2/cdc").schema)
          .parquet(s"$root2/cdc"),
        "k", "v", "op", s"$root2/state", s"$root2/ckpt")
    }
    assert(chain(ex2).exists(_.contains("unknown op value")),
      "NULL op must refuse, not silently drop the row")
  }

  test("batch-order invariance: one batch ≡ three batches (same content)") {
    val rootA = graft.sources.Scratch.dir("cdc-agg-one")
    val rootB = graft.sources.Scratch.dir("cdc-agg-three")
    for (root <- Seq(rootA, rootB)) {
      Maintain.writeAggCdcState(orders.filter(col("o_orderkey") % 10 =!= 0),
        "o_orderstatus", "o_totalprice", s"$root/state")
      writeCdc(root)
    }
    // A: everything in one fold
    Maintain.foldAggStateWithDeletes(spark, s"$rootA/state",
      spark.read.parquet(s"$rootA/cdc").filter(col("op") === "insert"),
      spark.read.parquet(s"$rootA/cdc").filter(col("op") === "delete"),
      "o_orderstatus", "o_totalprice", batchId = Some(0L))
    // B: three micro-batches via the stream
    StreamOps.maintainAggCdcStream(cdcStream(rootB), "o_orderstatus",
      "o_totalprice", "op", s"$rootB/state", s"$rootB/ckpt").stop()
    assert(aggRows(Maintain.readAggCdcState(spark, s"$rootA/state"))
      == aggRows(Maintain.readAggCdcState(spark, s"$rootB/state")),
      "fold result depends on the batch split")
  }
}
