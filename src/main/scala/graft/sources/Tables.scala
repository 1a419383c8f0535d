package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Typed accessors for the driver testdata tables (`TESTDATA.md`,
  * schemas in `FIXTURES.md`) plus schema-first CSV/JSON readers for
  * reference-shaped inputs (SURVEY §2.1 S1/S2).
  *
  * Parquet carries its own schema; the explicit `StructType`s here are
  * for the CSV/JSON reference sources, where inference would be
  * nondeterministic (reference infers with pandas — `dags/etl.py:41-43`).
  */
object Tables {

  def parquet(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = parquet(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = parquet(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = parquet(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = parquet(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = parquet(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = parquet(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = parquet(s, d, "lineitem")
  /** Raw `events.parquet` schema with `ts` as plain INT64 nanos — the
    * per-read alternative to the session-wide
    * `spark.sql.legacy.parquet.nanosAsLong` conf (which would silently
    * change the schema of every later nanos-parquet read in the session). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) under schema inference. Supplying
    * [[eventsRawSchema]] (ts: LongType) reads the raw nanos without any
    * session conf; then rebuild a microsecond TIMESTAMP with exact integer
    * division (`div`, not `/` — ns epochs exceed 2^53 so a double round
    * trip would corrupt them). Truncation keeps every ms-aligned
    * comparison (orders/lineitem timestamps) exact. */
  def events(s: SparkSession, d: String): DataFrame =
    s.read.schema(eventsRawSchema).parquet(s"$d/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = parquet(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = parquet(s, d, "embeddings")

  /** Registers every testdata table as a temp view so `spark.sql` queries
    * (grouping sets, CTE-heavy ops) can reference them by name. Idempotent. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach(n => parquet(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }

  // ---- Reference-shaped schemas (FIXTURES.md §A) -------------------------

  /** orders.csv: Fecha,Product_ID,User_ID — `dags/etl.py:161-168`. */
  val refOrdersSchema: StructType = StructType(Seq(
    StructField("Fecha", StringType),
    StructField("Product_ID", LongType),
    StructField("User_ID", LongType)))

  /** products.csv: Id,Name,Category,Price — `dags/etl.py:170-176`. */
  val refProductsSchema: StructType = StructType(Seq(
    StructField("Id", LongType),
    StructField("Name", StringType),
    StructField("Category", StringType),
    StructField("Price", LongType)))

  /** users.csv: Id,Document — `dags/etl.py:178-184`. */
  val refUsersSchema: StructType = StructType(Seq(
    StructField("Id", LongType),
    StructField("Document", LongType)))

  /** user_info.json: {status, data:[{document,...}]} — `dags/etl.py:34-40`. */
  val refUserInfoSchema: StructType = StructType(Seq(
    StructField("status", LongType),
    StructField("data", ArrayType(StructType(Seq(
      StructField("document", LongType),
      StructField("name", StringType),
      StructField("birthday", StringType),
      StructField("gender", StringType),
      StructField("email", StringType),
      StructField("phone", StringType)))))))

  /** S1: header CSV with an explicit schema (no inference). */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S3: execute a `.sql` file against the session catalog — the
    * reference's templated PostgresOperator file execution
    * (`dags/etl.py:156,218-235`) without the filesystem side-channel. */
  def sqlFile(spark: SparkSession, path: String): DataFrame =
    spark.sql(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** S2: whole-document JSON `{status, data:[...]}` flattened to one row
    * per element of `data` (reference: `pd.json_normalize(data['data'])`,
    * `dags/etl.py:36-40`). */
  def userInfoJson(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.option("multiLine", "true").schema(refUserInfoSchema)
      .json(path)
      .select(explode(col("data")).as("r"))
      .select("r.*")
  }
}
