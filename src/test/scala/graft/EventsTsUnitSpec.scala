package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-11 regression law: the driver regenerated
  * `/root/testdata` with `events.ts` as timestamp[us] while the reader
  * assumed raw INT64 nanos, collapsing January 2024 into January 1970
  * and silently failing 14 queries. `Tables.events` must now sniff the
  * footer's logical type and return IDENTICAL wall-clock instants for
  * the same data written in every unit the driver has ever used:
  * timestamp[us] (current), TIMESTAMP(NANOS) (pre-r11), and an
  * unannotated INT64 nanos column (the raw historic form).
  */
class EventsTsUnitSpec extends AnyFunSuite with SparkSpec {

  // one instant per row, µs precision (ns fixtures carry trailing ns
  // that the reader truncates to µs — covered by a dedicated case)
  private val instantsUs: Seq[Long] = Seq(
    1704067200000000L, // 2024-01-01T00:00:00Z
    1711929600123456L, // 2024-04-01T00:00:00.123456Z
    1735689599999999L) // 2024-12-31T23:59:59.999999Z

  private def rows = instantsUs.zipWithIndex.map { case (us, i) =>
    (i.toLong, us, 100L + i, s"type_$i", i * 1.5, s"""{"k":$i}""")
  }

  /** Writes a Spark DataFrame as the single FILE `$out/events.parquet`
    * (the driver's testdata shape — and what the streaming reader's
    * pathGlobFilter expects), by writing a 1-part directory and moving
    * the part file out. */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame, name: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val out = graft.sources.Scratch.dir(name)
    val tmp = s"$out/_stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, Paths.get(s"$out/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    out
  }

  private def eventsDf = {
    val s = spark; import s.implicits._
    rows.toDF("event_id", "tsUs", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("tsUs"))).drop("tsUs")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** ts as annotated timestamp[us] (what the driver's pyarrow currently
    * produces); Spark's default writer emits legacy INT96, so pin the
    * output type for the write. */
  private def writeMicros(): String = {
    val key = "spark.sql.parquet.outputTimestampType"
    val old = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try writeSingleFile(eventsDf, "ts-unit-us")
    finally spark.conf.set(key, old)
  }

  /** ts as legacy unannotated INT96 (Spark's own default writer output —
    * a third on-disk shape the sniffer must route to the native reader). */
  private def writeInt96(): String = {
    val key = "spark.sql.parquet.outputTimestampType"
    val old = spark.conf.get(key)
    spark.conf.set(key, "INT96")
    try writeSingleFile(eventsDf, "ts-unit-int96")
    finally spark.conf.set(key, old)
  }

  /** Writes `events.parquet` with ts annotated TIMESTAMP(isAdjustedToUTC,
    * NANOS) — Spark cannot write this itself, so use parquet-hadoop's
    * example Group writer directly (same jars Spark ships). This is the
    * exact shape of the pre-regeneration pyarrow testdata. */
  private def writeNanos(extraNs: Long): String = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Type.Repetition.REQUIRED

    val schema = Types.buildMessage()
      .addField(Types.primitive(INT64, REQUIRED).named("event_id"))
      .addField(Types.primitive(INT64, REQUIRED)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts"))
      .addField(Types.primitive(INT64, REQUIRED).named("user_id"))
      .addField(Types.primitive(BINARY, REQUIRED)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.primitive(DOUBLE, REQUIRED).named("value"))
      .addField(Types.primitive(BINARY, REQUIRED)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")

    val out = graft.sources.Scratch.dir(s"ts-unit-ns-$extraNs")
    val file = new Path(s"$out/events.parquet")
    val conf = spark.sessionState.newHadoopConf()
    val writer = ExampleParquetWriter.builder(file)
      .withConf(conf).withType(schema)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, us, uid, et, v, p) =>
      val g = gf.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L + extraNs)
      g.add("user_id", uid)
      g.add("event_type", et)
      g.add("value", v)
      g.add("props", p)
      writer.write(g)
    } finally writer.close()
    out
  }

  /** Writes events with ts as a plain unannotated INT64 of epoch nanos
    * (the historic raw form the forced-Long reader was built for). */
  private def writeRawInt64(): String = {
    val s = spark; import s.implicits._
    writeSingleFile(
      rows.map { case (id, us, uid, et, v, p) => (id, us * 1000L, uid, et, v, p) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      "ts-unit-raw")
  }

  private def readInstants(dir: String): Seq[(Long, Long)] =
    graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)

  test("sniffer classifies each on-disk unit from the footer") {
    import graft.sources.Tables
    assert(Tables.eventsTsUnit(spark, writeMicros()) == Tables.TsUnit.Native)
    assert(Tables.eventsTsUnit(spark, writeInt96()) == Tables.TsUnit.Native)
    assert(Tables.eventsTsUnit(spark, writeNanos(0L)) == Tables.TsUnit.Nanos)
    assert(Tables.eventsTsUnit(spark, writeRawInt64()) == Tables.TsUnit.Nanos)
    // and the REAL testdata is classified by what the footer says, not
    // by assumption — this is the line that was wrong in round 11
    assert(Tables.eventsTsUnit(spark, "/root/testdata/sf0.001") ==
      Tables.TsUnit.Native)
  }

  test("identical instants through Tables.events for us / ns / raw-int64 fixtures") {
    val expected = instantsUs.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    assert(readInstants(writeMicros()) == expected)
    assert(readInstants(writeInt96()) == expected)
    assert(readInstants(writeNanos(0L)) == expected)
    assert(readInstants(writeRawInt64()) == expected)
    // sub-µs nanos truncate (div, not round) — ms-aligned joins stay exact
    assert(readInstants(writeNanos(999L)) == expected)
  }

  test("streaming reader shares the batch plan: same instants per unit") {
    for (dir <- Seq(writeMicros(), writeNanos(0L))) {
      val stream = graft.streaming.StreamOps.eventsStream(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      val sink = s"ts_unit_sink_${dir.hashCode.toHexString}"
      val q = stream.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
      assert(got == instantsUs.zipWithIndex.map { case (us, i) => (i.toLong, us) })
    }
  }

  test("canary: real testdata events land in [2000, 2100), never 1970") {
    val yr = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) < 2100,
      s"events.ts outside [2000,2100): ${yr.getInt(0)}..${yr.getInt(1)} — " +
        "testdata format drifted; fix Tables.eventsReadPlan, not the queries")
  }
}
