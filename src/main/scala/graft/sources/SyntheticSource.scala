package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S4 — the reference's synthetic data generator
  * (`create_data_source.ipynb` cells 3–9: users with name/gender/date
  * columns built row-by-row in pandas) re-expressed as a Spark
  * DataSource V2 table:
  *
  * {{{
  *   spark.read.format("graft-synth")
  *     .option("rows", 100000).option("partitions", 8)
  *     .load()
  * }}}
  *
  * Generation is a pure function of the row id (no RNG state), so the
  * output is deterministic for any partition count and an external SQL
  * oracle reproduces it exactly from `generate_series`. The row range
  * splits evenly across `partitions` input partitions — each executor
  * generates its slice independently, the 100 TB shape for synthetic
  * benchmarking corpora (no driver materialization, no shuffle).
  * Column pruning is pushed into the reader: a `select(id)` never
  * formats names or dates. */
class SyntheticSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("gender", StringType, nullable = false),
    StructField("signup_date", StringType, nullable = false)))

  private val genders = Array("M", "F", "Other")

  /** Value of `col` for row `i` — the single source of truth shared by
    * every reader (and mirrored in the SQL oracle). */
  def value(col: String, i: Long): Any = col match {
    case "id" => i
    case "name" => UTF8String.fromString(s"user_$i")
    case "gender" => UTF8String.fromString(genders((i % 3).toInt))
    case "signup_date" =>
      // day (i mod 3650) counted back from 2024-01-01, ISO-formatted
      UTF8String.fromString(
        java.time.LocalDate.of(2024, 1, 1).minusDays(i % 3650).toString)
  }
}

private class SyntheticTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions)
}

private class SyntheticScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = SyntheticSource.schema
  // id-range predicates narrow the GENERATED range — a filtered read of
  // a trillion-row table generates only the asked-for slice
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def num(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue); case _ => None
    }
    // Saturating successor: `v + 1` wraps at Long.MaxValue, which would
    // silently flip an accepted exclusive bound to the wrong end of the
    // range (accepted filters are never re-checked post-scan).
    def incSat(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    val (take, rest) = filters.partition {
      case EqualTo("id", v) => num(v).isDefined
      case GreaterThan("id", v) => num(v).isDefined
      case GreaterThanOrEqual("id", v) => num(v).isDefined
      case LessThan("id", v) => num(v).isDefined
      case LessThanOrEqual("id", v) => num(v).isDefined
      case _ => false
    }
    take.foreach {
      case EqualTo("id", v) =>
        lo = math.max(lo, num(v).get); hi = math.min(hi, incSat(num(v).get))
      case GreaterThan("id", v) => lo = math.max(lo, incSat(num(v).get))
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, num(v).get)
      case LessThan("id", v) => hi = math.min(hi, num(v).get)
      case LessThanOrEqual("id", v) => hi = math.min(hi, incSat(num(v).get))
      case _ => ()
    }
    accepted = take
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def description(): String =
      s"graft-synth range [$lo, ${math.max(lo, hi)})"
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val end = math.max(lo, hi)
      val span = end - lo
      if (span <= 0) return Array.empty
      val per = math.max(1L, (span + partitions - 1) / partitions)
      (lo until end by per)
        .map(start => SyntheticPartition(start, math.min(start + per, end))
          : InputPartition)
        .toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new SyntheticReaderFactory(required.fieldNames)
  }
}

private case class SyntheticPartition(start: Long, end: Long)
    extends InputPartition

private class SyntheticReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map(SyntheticSource.value(_, i)))
      override def close(): Unit = ()
    }
  }
}
