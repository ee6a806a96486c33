package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NativeKernels
import graft.model.Domains

/** DataSource V2 implementation of the synthetic `Record` source:
  *
  *   spark.read.format("graft-records")
  *     .option("rows", 100000).option("seed", 42).option("partitions", 32)
  *     .load()
  *
  * The connector-level restatement of the generator (SURVEY.md §2.1/S7) —
  * where `DataGenerator` builds records with column expressions over
  * `spark.range`, this is the same capability as a pluggable source:
  *
  *  - `planInputPartitions` splits the id space into `partitions` ranges —
  *    source-level parallelism, no driver materialization, scales by adding
  *    splits exactly like a file scan scales by adding row groups;
  *  - `SupportsPushDownRequiredColumns` prunes generation to the projected
  *    columns (a `select(email)` never builds bodies or addresses);
  *  - rows are deterministic functions of (seed, id), so output is identical
  *    for ANY partitioning — asserted in the spec.
  */
class RecordDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-records"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RecordGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RecordTable(properties.asScala.toMap)
}

private[v2] class RecordTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "graft_records"
  override def schema(): StructType = RecordGen.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RecordScanBuilder(
      options.getLong("rows", 1000L),
      options.getLong("seed", 42L),
      options.getInt("partitions", 8))
}

private[v2] class RecordScanBuilder(rows: Long, seed: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RecordGen.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new RecordScan(rows, seed, partitions, required)
}

private[v2] case class RecordRange(start: Long, end: Long) extends InputPartition

private[v2] class RecordScan(rows: Long, seed: Long, partitions: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-records rows=$rows seed=$seed partitions=$partitions"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    val step = math.max(1L, (rows + n - 1) / n)
    (0L until rows by step)
      .map(s => RecordRange(s, math.min(s + step, rows)))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RecordReaderFactory(seed, required.fieldNames)
}

private[v2] class RecordReaderFactory(seed: Long, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[RecordRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow = RecordGen.row(id, seed, fields)
      override def close(): Unit = ()
    }
  }
}

/** Deterministic per-(seed,id) field generation for the V2 source. Field
  * distributions mirror the reference generator's domains (§1.3); every
  * field is derived independently so pruned reads skip unrequested work.
  */
object RecordGen {
  import org.apache.spark.sql.types._

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false),
    StructField("first_name", StringType, nullable = false),
    StructField("last_name", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("phone_number", StringType, nullable = false),
    StructField("date_of_birth", StringType, nullable = false),
    StructField("address", StructType(Seq(
      StructField("street", StringType, nullable = false),
      StructField("city", StringType, nullable = false),
      StructField("state", StringType, nullable = false),
      StructField("postal_code", StringType, nullable = false),
      StructField("country", StringType, nullable = false))), nullable = false),
    StructField("account_type", StringType, nullable = false),
    StructField("account_status", StringType, nullable = false),
    StructField("last_login_date", TimestampType, nullable = false),
    StructField("account_balance", DoubleType, nullable = false),
    StructField("language", StringType, nullable = false),
    StructField("communication_preferences",
      ArrayType(StringType, containsNull = false), nullable = false),
    StructField("newsletter_subscribed", BooleanType, nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("body", StringType, nullable = false)))

  /** Micros for 2026-01-01T00:00:00Z — same anchor as DataGenerator. */
  private val baseMicros = 1767225600000000L

  private def h(id: Long, seed: Long, salt: Int): Long =
    NativeKernels.splitmix64(
      NativeKernels.splitmix64(id + seed * 0x9e3779b97f4a7c15L) + salt)

  private def mod(id: Long, seed: Long, salt: Int, m: Long): Long =
    math.floorMod(h(id, seed, salt), m)

  private def pick(domain: Seq[String], id: Long, seed: Long, salt: Int): String =
    domain(mod(id, seed, salt, domain.size.toLong).toInt)

  private def utf8(s: String) = UTF8String.fromString(s)

  /** One field's value (internal representation). */
  private def value(field: String, id: Long, seed: Long): Any = field match {
    case "id" =>
      val h1 = h(id, seed, 1); val h2 = h(id, seed, 2)
      utf8(f"${h1 >>> 32}%08x-${(h1 >>> 16) & 0xffff}%04x-4${h1 & 0xfff}%03x-${(h2 >>> 48) & 0xffff}%04x-${h2 & 0xffffffffffffL}%012x")
    case "created_at" => baseMicros - mod(id, seed, 3, 365L * 86400L) * 1000000L
    case "updated_at" => baseMicros
    case "first_name" => utf8(pick(Domains.firstNames, id, seed, 10))
    case "last_name" => utf8(pick(Domains.lastNames, id, seed, 11))
    case "email" => utf8(
      (pick(Domains.firstNames, id, seed, 10) + "." +
        pick(Domains.lastNames, id, seed, 11) + "@" +
        pick(Domains.emailDomains, id, seed, 12)).toLowerCase)
    case "phone_number" => utf8(
      f"+1-${mod(id, seed, 13, 1000L)}%03d-${mod(id, seed, 14, 1000L)}%03d-${mod(id, seed, 15, 10000L)}%04d")
    case "date_of_birth" => utf8(
      f"${mod(id, seed, 16, 50L) + 1950}%04d-${mod(id, seed, 17, 12L) + 1}%02d-${mod(id, seed, 18, 28L) + 1}%02d")
    case "address" => new GenericInternalRow(Array[Any](
      utf8(s"${mod(id, seed, 19, 9999L) + 1} ${pick(Domains.streets, id, seed, 20)}"),
      utf8(pick(Domains.cities, id, seed, 21)),
      utf8(pick(Domains.states, id, seed, 22)),
      utf8(f"${mod(id, seed, 23, 100000L)}%05d"),
      utf8(pick(Domains.countries, id, seed, 24))))
    case "account_type" => utf8(pick(Domains.accountTypes, id, seed, 25))
    case "account_status" => utf8(pick(Domains.accountStatuses, id, seed, 26))
    case "last_login_date" => baseMicros - mod(id, seed, 2, 30L * 86400L) * 1000000L
    case "account_balance" => mod(id, seed, 27, 1000000L).toDouble / 100.0
    case "language" => utf8(pick(Domains.languages, id, seed, 28))
    case "communication_preferences" =>
      val n = mod(id, seed, 34, 4L).toInt + 1
      new GenericArrayData((0 until n).map(i =>
        utf8(pick(Domains.commPrefs, id, seed, 30 + i))).toArray[Any])
    case "newsletter_subscribed" => mod(id, seed, 35, 2L) == 1L
    case "tags" =>
      val n = mod(id, seed, 39, 4L).toInt
      new GenericArrayData((0 until n).map(i =>
        utf8(pick(Domains.tagPool, id, seed, 36 + i))).toArray[Any])
    case "body" =>
      val sb = new java.lang.StringBuilder(Domains.bodyLength)
      var st = h(id, seed, 40)
      var i = 0
      while (i < Domains.bodyLength) {
        st = NativeKernels.splitmix64(st)
        sb.append(Domains.bodyCharset.charAt(
          math.floorMod(st, Domains.bodyCharset.length.toLong).toInt))
        i += 1
      }
      utf8(sb.toString)
    case other => throw new IllegalArgumentException(s"unknown field $other")
  }

  /** Build one row containing only the requested fields, in order. */
  def row(id: Long, seed: Long, fields: Array[String]): InternalRow =
    new GenericInternalRow(fields.map(f => value(f, id, seed)).asInstanceOf[Array[Any]])
}
