package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.{Sinks, Tables}

class SinksSkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("overwrite parquet sink round-trips and is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.overwriteParquet(df, s"$dir/t")
    Sinks.overwriteParquet(df, s"$dir/t") // overwrite = drop+create
    assert(spark.read.parquet(s"$dir/t").collect().toSet == df.collect().toSet)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val df = Seq((1L, "x", "2024-01-01"), (2L, "y", "2024-01-02"))
      .toDF("id", "v", "day")
    Sinks.overwriteParquet(df, s"$dir/p", partitionBy = Seq("day"))
    val pruned = spark.read.parquet(s"$dir/p").filter(col("day") === "2024-01-01")
    assert(pruned.count() == 1)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(!scanned.contains("2024-01-02")) // partition dir not in scan
  }

  test("CSV sink writes header and round-trips with schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val df = Seq((1L, "a")).toDF("id", "v")
    Sinks.overwriteCsv(df, s"$dir/c")
    val back = spark.read.option("header", "true").csv(s"$dir/c")
    assert(back.columns.toSeq == Seq("id", "v") && back.count() == 1)
  }

  test("salted join equals plain join") {
    val large = (1 to 1000).map(i => (i.toLong % 3, i)).toDF("k", "v")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(large, small, "k").select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // a cloned session so the aggressive skew thresholds never leak
    // into other suites' plans
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE re-checks broadcastability with its OWN threshold at runtime
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import org.apache.spark.sql.functions.{col, when, lit}
    // 200k rows, 95% on key 0 — one reducer partition dwarfs the rest
    val left = s2.range(200000)
      .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = s2.range(100).select(col("id").as("k"), col("id").as("w"))
    val joined = left.join(right, "k")
    // materialize THIS query execution (count() would plan a separate
    // one, leaving this AdaptiveSparkPlan un-finalized)
    assert(joined.collect().length == 190000 + 5) // key 0 + 20/40/60/80
    def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // string check: finalized query stages are LEAF nodes, so a tree
    // collect cannot see the join inside them — the rendering can
    val plan = finalPlan(joined.queryExecution.executedPlan).toString
    assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
      s"AQE did not mark the skewed join:\n${plan.take(1200)}")
  }

  test("key histogram finds the hot key") {
    val df = (1 to 100).map(i => if (i <= 90) 7L else i.toLong).toDF("k")
    val top = Skew.keyHistogram(df, col("k"), 1).as[(Long, Long)].head()
    assert(top == ((7L, 90L)))
  }

  test("range-sharded export: files = shards, disjoint ordered key ranges, content exact") {
    import org.apache.spark.sql.functions.{col, input_file_name, min => fmin, max => fmax}
    // the training-shard layout law: a reader that consumes shard files
    // in range order streams the whole dataset in key order without any
    // engine re-sort — so every file's [min, max] key interval must sit
    // entirely at-or-before the next file's
    val packed = graft.operators.TextOps.packOffsets(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text", 128)
    val out = graft.sources.Scratch.dir("shard-law") + "/pack"
    Sinks.writeRangeShards(packed, out, "seq_idx", 8)
    val back = spark.read.parquet(out)
    // content: exact multiset round trip
    assert(back.count() == packed.count())
    assert(back.exceptAll(packed).isEmpty && packed.exceptAll(back).isEmpty,
      "shard export changed the rows")
    // layout: one parquet file per shard, ranges disjoint up to boundary
    // key ties (equal keys never split across shards, so touching
    // endpoints can only be the same key)
    def shardRanges(dir: String) =
      spark.read.parquet(dir).groupBy(input_file_name().as("f"))
        .agg(fmin(col("seq_idx")).as("lo"), fmax(col("seq_idx")).as("hi"))
        .orderBy(col("lo"))
        .select("lo", "hi").as[(Long, Long)].collect()
    val ranges = shardRanges(out)
    assert(ranges.length == 8, s"expected 8 shard files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"shard ranges overlap: hi=$hi > next lo=$lo2")
      case _ => ()
    }
    // auto-sizing: nShards = 0 derives ceil(rows / targetRowsPerShard)
    // and the layout law holds for the derived count too
    val out2 = graft.sources.Scratch.dir("shard-law-auto") + "/pack"
    val rows = packed.count()
    Sinks.writeRangeShards(packed, out2, "seq_idx", nShards = 0,
      targetRowsPerShard = 100L)
    val auto = shardRanges(out2)
    assert(auto.length == ((rows + 99) / 100).toInt,
      s"auto sizing produced ${auto.length} shards for $rows rows")
    auto.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"auto shard ranges overlap: hi=$hi > next lo=$lo2")
      case _ => ()
    }
    // manifest: one row per part file with its range and count — the
    // coordination table a 10⁵-shard reader uses instead of probing
    // footers; it must NOT become part of the data on re-read
    Sinks.writeShardManifest(spark, out, "seq_idx")
    val mf = Sinks.readShardManifest(spark, out)
      .select("file", "lo", "hi", "rows")
    val m = mf.as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(m.length == 8, s"manifest rows ${m.length} != 8 shard files")
    assert(m.map(_._4).sum == packed.count(),
      "manifest row counts must sum to the exported total")
    m.map(x => (x._2, x._3)).zip(ranges).foreach { case ((a, b), (c, d)) =>
      assert(a == c && b == d, "manifest ranges diverge from the files") }
    // the underscore dir is invisible to a plain data read
    assert(spark.read.parquet(out).count() == packed.count(),
      "_manifest leaked into the data read")
  }

  test("bucketed table join plans without an exchange on the fact side") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), 4)
    val t = spark.table("li_bucketed")
    val agg = t.groupBy("l_orderkey").agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed agg should not shuffle:\n$plan")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
  }

  test("sort-merge-bucket join + same-key agg plans with ZERO exchanges") {
    val d = "/root/testdata/sf0.001"
    Sinks.writeBucketed(Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_totalprice")),
      "o_bj_law", Seq("o_orderkey"), 4)
    Sinks.writeBucketed(Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_quantity")),
      "li_bj_law", Seq("l_orderkey"), 4)
    val joined = spark.table("li_bj_law").hint("merge")
      .join(spark.table("o_bj_law"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"SMB join + same-key agg should be exchange-free:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      "the merge hint must hold the SMB shape (broadcast would hide co-location)")
    // and the result is the plain join's result
    val want = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("qty"), max("o_totalprice").as("price"))
    assert(joined.exceptAll(want).isEmpty && want.exceptAll(joined).isEmpty)
    spark.sql("DROP TABLE IF EXISTS o_bj_law")
    spark.sql("DROP TABLE IF EXISTS li_bj_law")
  }
}

class SqlFileSpec extends AnyFunSuite with SparkSpec {
  test("S3: SQL file scan executes against the session catalog") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val f = java.nio.file.Files.createTempFile("graft", ".sql")
    java.nio.file.Files.writeString(f,
      "SELECT r_name FROM region ORDER BY r_name")
    val out = Tables.sqlFile(spark, f.toString)
    assert(out.count() == 5)
  }
}
