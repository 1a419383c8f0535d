package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Maintain, Quality}

/** Top-k maintenance laws: under append-only deltas the k-bounded state
  * refreshes EXACTLY — merge(state, delta) ≡ one-shot top-k, refreshes
  * chain, and a wrong-kind state dir is refused loudly. */
class TopKMaintainSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def board(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Double, Int)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getInt(3))).toSeq.sortBy(t => (t._1, t._4))

  test("merge(state, delta) equals the one-shot top-k over everything") {
    val o = graft.sources.Tables.orders(spark, dir)
    val root = graft.sources.Scratch.dir("topk-maint-law")
    Maintain.writeTopKState(o.filter(col("o_orderkey") % 10 =!= 0),
      "o_orderstatus", "o_orderkey", "o_totalprice", 10, root)
    val merged = Maintain.mergeTopKState(spark, root,
      o.filter(col("o_orderkey") % 10 === 0),
      "o_orderstatus", "o_orderkey", "o_totalprice")
    val oneShot = graft.operators.TopK.topKPerGroup(
      o.select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice")),
      "o_orderstatus", "o_orderkey", "o_totalprice", 10)
    assert(board(merged) == board(oneShot))
  }

  test("refreshes chain: fold delta1, rewrite, fold delta2 ≡ one-shot") {
    val o = graft.sources.Tables.orders(spark, dir)
    val root = graft.sources.Scratch.dir("topk-maint-chain")
    Maintain.writeTopKState(o.filter(col("o_orderkey") % 3 === 0),
      "o_orderstatus", "o_orderkey", "o_totalprice", 5, root)
    val after1 = Maintain.mergeTopKState(spark, root,
      o.filter(col("o_orderkey") % 3 === 1),
      "o_orderstatus", "o_orderkey", "o_totalprice")
    // persist the refreshed board as the new state (what a daily
    // refresh job does), then fold the second delta
    after1.drop("rk").write.mode("overwrite").parquet(s"$root/state")
    val after2 = Maintain.mergeTopKState(spark, root,
      o.filter(col("o_orderkey") % 3 === 2),
      "o_orderstatus", "o_orderkey", "o_totalprice")
    val oneShot = graft.operators.TopK.topKPerGroup(
      o.select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice")),
      "o_orderstatus", "o_orderkey", "o_totalprice", 5)
    assert(board(after2) == board(oneShot))
  }

  test("streaming twin: multi-batch fold ≡ one-shot; replay rewrite idempotent") {
    val o = graft.sources.Tables.orders(spark, dir)
    val root = graft.sources.Scratch.dir("topk-maint-stream")
    Maintain.writeTopKState(o.filter(col("o_orderkey") % 10 =!= 0),
      "o_orderstatus", "o_orderkey", "o_totalprice", 10, root)
    o.filter(col("o_orderkey") % 10 === 0).repartition(3)
      .write.mode("overwrite").parquet(s"$root/delta")
    val q = graft.streaming.StreamOps.maintainTopKStream(
      spark.readStream.schema(o.schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$root/delta"),
      "o_orderstatus", "o_orderkey", "o_totalprice", root, s"$root/ckpt")
    q.stop()
    def refreshed() = board(Maintain.readTopKRefreshed(spark, root,
      "o_orderstatus", "o_orderkey", "o_totalprice"))
    val oneShot = board(graft.operators.TopK.topKPerGroup(
      o.select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice")),
      "o_orderstatus", "o_orderkey", "o_totalprice", 10))
    assert(refreshed() == oneShot, "streamed fold != one-shot top-k")
    val batches = spark.read.parquet(s"$root/batches")
      .select("ingest_batch").distinct().count()
    assert(batches == 3, s"expected 3 micro-batch partitions, saw $batches")
    // replay: rewrite partition 0 with its own content — board must not move
    val p0Path = s"$root/batches/ingest_batch=0"
    val p0 = spark.read.parquet(p0Path)
    val p0Rows = java.util.Arrays.asList(p0.collect(): _*)
    spark.createDataFrame(p0Rows, p0.schema)
      .write.mode("overwrite").parquet(p0Path)
    assert(refreshed() == oneShot, "replayed partition rewrite moved the board")
  }

  test("slack state: delete-bearing fold ≡ one-shot over the live corpus") {
    import spark.implicits._
    // group a: 10 rows scored 100..91; group b: 6 rows 60..55
    val base = ((1 to 10).map(i => ("a", i.toLong, 101.0 - i)) ++
      (11 to 16).map(i => ("b", i.toLong, 71.0 - i))).toDF("g", "id", "s")
    val dir = graft.sources.Scratch.dir("topk-slack-law")
    Maintain.writeTopKSlackState(base, "g", "id", "s", k = 2, slack = 2, dir)
    // delta appends a new leader to a; deletes take a's current top row
    // (a board hit — real slack spend) and an unseen below-horizon row
    // (id 8, outside a's stored top-4 — must consume NO slack)
    val delta = Seq(("a", 99L, 250.0)).toDF("g", "id", "s")
    val dels = Seq(("a", 1L), ("a", 8L)).toDF("g", "id")
    Maintain.foldTopKSlackState(spark, dir, delta, dels, "g", "id", "s")
    val served = Maintain.serveTopKSlack(spark, dir, "g", "id", "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    assert(served == Set(("a", 99L, 250.0, 1), ("a", 2L, 99.0, 2),
      ("b", 11L, 60.0, 1), ("b", 12L, 59.0, 2)),
      s"served board wrong: $served")
    // a second fold chains: delete a's new leader, depth math composes
    Maintain.foldTopKSlackState(spark, dir,
      spark.emptyDataset[(String, Long, Double)].toDF("g", "id", "s"),
      Seq(("a", 99L)).toDF("g", "id"), "g", "id", "s")
    val served2 = Maintain.serveTopKSlack(spark, dir, "g", "id", "s")
      .filter(col("g") === "a")
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(served2 == Set((2L, 1), (3L, 2)), s"chained fold wrong: $served2")
  }

  test("slack fold replay: committed batchId skips; unguarded re-fold " +
    "is idempotent (dedup + tombstone re-miss)") {
    import spark.implicits._
    val base = (1 to 10).map(i => ("a", i.toLong, 101.0 - i))
      .toDF("g", "id", "s")
    val dir = graft.sources.Scratch.dir("topk-slack-replay")
    Maintain.writeTopKSlackState(base, "g", "id", "s", k = 2, slack = 2, dir)
    val delta = Seq(("a", 99L, 250.0)).toDF("g", "id", "s")
    val dels = Seq(("a", 1L)).toDF("g", "id")
    Maintain.foldTopKSlackState(spark, dir, delta, dels, "g", "id", "s",
      batchId = Some(0L))
    def served(): Seq[(Long, Int)] =
      Maintain.serveTopKSlack(spark, dir, "g", "id", "s")
        .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq.sorted
    val board = served()
    assert(board == Seq((2L, 2), (99L, 1)))
    // a redelivered batchId 0 with DIFFERENT content must skip outright
    Maintain.foldTopKSlackState(spark, dir,
      Seq(("a", 777L, 999.0)).toDF("g", "id", "s"),
      Seq(("a", 2L)).toDF("g", "id"), "g", "id", "s", batchId = Some(0L))
    assert(served() == board, "committed batchId replay was not skipped")
    // an UNGUARDED re-fold of the same content (crash before the
    // marker) is idempotent: dedup collapses the re-appended rows and
    // the re-applied tombstone hits nothing
    Maintain.foldTopKSlackState(spark, dir, delta, dels, "g", "id", "s")
    assert(served() == board, "unguarded same-content re-fold moved the board")
  }

  test("slack exhaustion raises loudly instead of serving staleness") {
    import spark.implicits._
    val base = (1 to 20).map(i => ("a", i.toLong, 101.0 - i))
      .toDF("g", "id", "s")
    val dir = graft.sources.Scratch.dir("topk-slack-refuse")
    Maintain.writeTopKSlackState(base, "g", "id", "s", k = 2, slack = 2, dir)
    // delete 3 of the 4 stored rows: depth 4 → 1 < k — the true rank-2
    // row (id 5) is below the horizon, so serving would be WRONG
    val e = intercept[Exception] {
      Maintain.foldTopKSlackState(spark, dir,
        spark.emptyDataset[(String, Long, Double)].toDF("g", "id", "s"),
        Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("g", "id"), "g", "id", "s")
      Maintain.serveTopKSlack(spark, dir, "g", "id", "s").collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(e).exists(_.contains("slack exhausted")),
      s"expected the slack refusal, got: ${chain(e).take(3).mkString(" | ")}")
  }

  test("complete groups tolerate any deletion depth (state holds all)") {
    import spark.implicits._
    // 3 rows, cap = 4 → complete: the ledger knows everything, so even
    // deleting down to a single row serves exactly, never refuses
    val base = Seq(("a", 1L, 9.0), ("a", 2L, 8.0), ("a", 3L, 7.0))
      .toDF("g", "id", "s")
    val dir = graft.sources.Scratch.dir("topk-slack-complete")
    Maintain.writeTopKSlackState(base, "g", "id", "s", k = 2, slack = 2, dir)
    Maintain.foldTopKSlackState(spark, dir,
      spark.emptyDataset[(String, Long, Double)].toDF("g", "id", "s"),
      Seq(("a", 1L), ("a", 2L)).toDF("g", "id"), "g", "id", "s")
    val served = Maintain.serveTopKSlack(spark, dir, "g", "id", "s")
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(served == Set((3L, 1)), s"complete-group board wrong: $served")
  }

  test("fully tombstoned incomplete group refuses (unseen rows remain)") {
    import spark.implicits._
    val base = (1 to 20).map(i => ("a", i.toLong, 101.0 - i))
      .toDF("g", "id", "s")
    val dir = graft.sources.Scratch.dir("topk-slack-wipe")
    Maintain.writeTopKSlackState(base, "g", "id", "s", k = 2, slack = 2, dir)
    val e = intercept[Exception] {
      Maintain.foldTopKSlackState(spark, dir,
        spark.emptyDataset[(String, Long, Double)].toDF("g", "id", "s"),
        (1 to 4).map(i => ("a", i.toLong)).toDF("g", "id"), "g", "id", "s")
      Maintain.serveTopKSlack(spark, dir, "g", "id", "s").collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(e).exists(_.contains("slack exhausted")),
      "a fully tombstoned incomplete group must refuse, not vanish")
  }

  test("CDC stream: a NULL op row refuses loudly instead of vanishing") {
    import spark.implicits._
    val base = (1 to 10).map(i => ("a", i.toLong, 101.0 - i))
      .toDF("g", "id", "s")
    val root = graft.sources.Scratch.dir("topk-slack-nullop")
    Maintain.writeTopKSlackState(base, "g", "id", "s", k = 2, slack = 2,
      s"$root/state")
    Seq((Option("insert"), "a", 99L, 250.0), (Option.empty[String], "a", 98L, 5.0))
      .toDF("op", "g", "id", "s")
      .write.mode("overwrite").parquet(s"$root/cdc")
    val e = intercept[Exception] {
      graft.streaming.StreamOps.maintainTopKSlackStream(
        spark.readStream.schema(spark.read.parquet(s"$root/cdc").schema)
          .parquet(s"$root/cdc"),
        "g", "id", "s", "op", s"$root/state", s"$root/ckpt")
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(e).exists(_.contains("unknown op")),
      s"expected the unknown-op refusal, got ${chain(e).take(3)}")
  }

  test("wrong-kind state dir is refused loudly") {
    val o = graft.sources.Tables.orders(spark, dir)
    val root = graft.sources.Scratch.dir("topk-maint-wrongkind")
    Maintain.writeQuantileState(o, "o_orderstatus", "o_totalprice",
      root, lo = 0.0, hi = 600000.0, bins = 8)
    val e = intercept[IllegalArgumentException] {
      Maintain.mergeTopKState(spark, root, o.limit(1),
        "o_orderstatus", "o_orderkey", "o_totalprice")
    }
    assert(e.getMessage.contains("not top-k state"))
  }
}

/** Constraint-audit arithmetic on a crafted table with KNOWN violation
  * counts of every class — nulls, out-of-range, rejected values,
  * regex misses, duplicate keys, orphan and null foreign keys. */
class QualityAuditSpec extends AnyFunSuite with SparkSpec {

  test("every violation class counts exactly") {
    import spark.implicits._
    val child = Seq(
      (1L, Option(10L), Option("O"), 5.0, "ok_1"),
      (2L, Option(10L), Option("F"), -1.0, "ok_2"),   // range violation
      (2L, Option(20L), Option("X"), 3.0, "bad name"), // dup key + rejected value + regex
      (3L, None, Option("O"), 2.0, "ok_3"),           // null fk
      (4L, Option(99L), None, 11.0, "ok_4")           // orphan fk + null status + range
    ).toDF("id", "fk", "status", "v", "name")
    val parent = Seq(10L, 20L).toDF("pk")

    val rep = Quality.report(Seq(
      Quality.rowChecks(child, Seq(
        Quality.notNull("status"),
        Quality.acceptedValues("status", Seq("O", "F")),
        Quality.inRange("v", 0.0, 10.0),
        Quality.matchesRegex("name", "^ok_[0-9]$"))),
      Quality.unique(child, "id"),
      Quality.refIntegrity(child, "fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(rep == Map(
      "not_null:status" -> 1L,
      "accepted_values:status" -> 2L, // 'X' plus the NULL
      "in_range:v" -> 2L,             // -1.0 and 11.0
      "matches_regex:name" -> 1L,
      "unique:id" -> 1L,              // one extra row on id=2
      "ref_integrity:fk->pk" -> 2L))  // null fk + orphan 99
  }

  test("refIntegrity carries no forced broadcast hint (parent scales)") {
    import spark.implicits._
    // TPC-H customer grows with scale factor — a forced broadcast of
    // the parent's distinct keys dies at the 100 TB design point; the
    // anti-join must be hint-free so AQE size-gates it at runtime.
    val child = Seq((1L, 10L), (2L, 99L)).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val rep = Quality.refIntegrity(child, "fk", parent, "pk")
    val hints = rep.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, "refIntegrity forces a broadcast hint")
  }

  test("all-clean table reports zeros, not missing rows") {
    import spark.implicits._
    val clean = Seq((1L, "A"), (2L, "B")).toDF("id", "tag")
    val rep = Quality.report(Seq(
      Quality.rowChecks(clean, Seq(Quality.notNull("tag"))),
      Quality.unique(clean, "id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("not_null:tag" -> 0L, "unique:id" -> 0L))
  }

  test("empty table reports zeros, never null violation counts") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "tag")
    val rep = Quality.report(Seq(
      Quality.rowChecks(empty, Seq(
        Quality.notNull("tag"), Quality.inRange("id", 0.0, 10.0))),
      Quality.unique(empty, "id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("not_null:tag" -> 0L, "in_range:id" -> 0L,
      "unique:id" -> 0L))
  }

  test("profileDrift: identical snapshots are all-OK with zero deltas; " +
      "a planted shift flags exactly the moved metrics; empty new " +
      "snapshot coalesces, never NPEs") {
    import spark.implicits._
    val old = Seq((1L, 10L, "aa"), (2L, 20L, "bb"), (3L, 30L, "cc"),
      (4L, 40L, "dd")).toDF("id", "v", "s")
    // law 1: self-drift is identically zero, every row OK
    val self = Quality.profileDrift(old, old, Seq("v"), Seq("s"))
      .collect()
    assert(self.length == 1 + 4 + 2)
    assert(self.forall(r => r.getLong(4) == 0L && r.getString(5) == "OK"))
    // law 2: a planted shift (drop half the rows, null one string)
    // flags rows/sum/bytes/nulls and leaves min untouched
    val shifted = old.filter(col("id") <= 2)
      .withColumn("s", when(col("id") === 2L, lit(null))
        .otherwise(col("s")))
    val rep = Quality.profileDrift(old, shifted, Seq("v"), Seq("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(rep(("__table__", "rows")) == (4L, 2L, 500L, "WARN"))
    assert(rep(("v", "min")) == (10L, 10L, 0L, "OK"))
    assert(rep(("v", "max")) == (40L, 20L, 500L, "WARN"))
    assert(rep(("v", "sum")) == (100L, 30L, 700L, "WARN"))
    // a null count rising from 0 divides by max(|old|,1) = 1
    assert(rep(("s", "nulls")) == (0L, 1L, 1000L, "WARN"))
    assert(rep(("s", "bytes")) == (8L, 2L, 750L, "WARN"))
    // law 3: an EMPTY new snapshot reports zeros (coalesced), loudly
    // WARN on rows, and never throws on null min/max/sum
    val gone = Quality.profileDrift(old, old.limit(0), Seq("v"), Seq("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(gone.values.forall(_ == 0L))
    // law 4: metric mapping is positional, never name-parsed — a
    // column containing the old separator, or literally named "rows",
    // keys its own report rows correctly
    val odd = Seq((1L, 7L, 3L), (2L, 9L, 4L))
      .toDF("id", "my__col", "rows")
    val oddRep = Quality.profileDrift(odd, odd,
      Seq("my__col", "rows")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(oddRep(("my__col", "sum")) == 16L)
    assert(oddRep(("rows", "sum")) == 7L)
    assert(oddRep(("__table__", "rows")) == 2L)
  }

  test("profileDrift: a metric past ~9.2e15 cannot overflow the " +
      "per-mille delta into a silent OK — the delta clamps and WARNs") {
    import spark.implicits._
    // |new−old|·1000 = 9.3e18 > Long.MaxValue: the pre-fix Long
    // arithmetic wrapped negative and reported OK on a catastrophic
    // shift (advisor r18); BigInt math clamps to Long.MaxValue
    val old = Seq((1L, 1L)).toDF("id", "bytes_total")
    val nw = Seq((1L, 9300000000000000L)).toDF("id", "bytes_total")
    val rep = Quality.profileDrift(old, nw, Seq("bytes_total"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getString(5))).toMap
    val (dpm, status) = rep(("bytes_total", "sum"))
    assert(status == "WARN", s"overflowed delta reported $status")
    assert(dpm == Long.MaxValue || dpm > 0L, s"delta wrapped: $dpm")
    // and far past the clamp threshold too (max metric vs old 0 → /1)
    val (dpmMax, stMax) = rep(("bytes_total", "max"))
    assert(stMax == "WARN" && dpmMax > 0L)
  }
}
