package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 read connector — the structural recipe the reference's
  * store source (Cassandra raw keyspace; SURVEY §0 [PUBLIC], connector
  * jar absent offline) would follow, demonstrated against a
  * deterministic synthetic table so the planner integration is fully
  * testable offline:
  *
  *  - [[TableProvider]] → `spark.read.format(<class name>)`
  *  - `SupportsPushDownRequiredColumns`: column pruning reaches the
  *    reader (narrow rows leave the source — a real store reads fewer
  *    cells, exactly Cassandra's column-slice path)
  *  - `SupportsPushDownFilters`: `day` bounds are consumed by the
  *    source; everything else stays a residual Spark filter
  *  - `planInputPartitions`: the day range splits into fixed-width
  *    slices and pushed day bounds PRUNE whole slices before any
  *    reader opens — the token-range pruning a store connector does
  *
  * Table: one row per (day, region): `day INT, region STRING,
  * rate_pct BIGINT` with rate_pct = 100 + (day + |region|) % 7 — pure
  * integer arithmetic, so tests compare against an expression-derived
  * DataFrame exactly. Options: `days` (total, default 64), `regions`
  * (count, default 4), `sliceDays` (partition width, default 8).
  */
class LedgerRatesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerRatesSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LedgerTable(
      Option(properties.get("days")).map(_.toInt).getOrElse(64),
      Option(properties.get("regions")).map(_.toInt).getOrElse(4),
      Option(properties.get("slicedays")).map(_.toInt).getOrElse(8))
}

object LedgerRatesSource {
  val Schema: StructType = StructType(Seq(
    StructField("day", IntegerType, nullable = false),
    StructField("region", StringType, nullable = false),
    StructField("rate_pct", LongType, nullable = false)))

  /** Partitions actually planned by the last scan — lets tests assert
    * slice pruning without reaching into the plan. */
  val plannedPartitions = new AtomicInteger(0)

  def regionName(i: Int): String = s"r$i"
  def ratePct(day: Int, region: String): Long = 100L + (day + region.length) % 7
}

private[sources] class LedgerTable(days: Int, regions: Int, sliceDays: Int)
  extends Table with SupportsRead {
  override def name(): String = "ledger_rates"
  override def schema(): StructType = LedgerRatesSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LedgerScanBuilder(days, regions, sliceDays)
}

private[sources] class LedgerScanBuilder(days: Int, regions: Int,
    sliceDays: Int) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0
  private var hi = days - 1
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = LedgerRatesSource.Schema

  // consume day bounds (tightening [lo, hi]); everything else is a
  // residual Spark evaluates post-scan — the store-connector contract
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("day", _: Integer) => true
      case GreaterThan("day", _: Integer) => true
      case GreaterThanOrEqual("day", _: Integer) => true
      case LessThan("day", _: Integer) => true
      case LessThanOrEqual("day", _: Integer) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("day", v: Integer) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("day", v: Integer) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("day", v: Integer) => lo = math.max(lo, v)
      case LessThan("day", v: Integer) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("day", v: Integer) => hi = math.min(hi, v)
      case _ =>
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new LedgerScan(lo, hi, regions, sliceDays,
    required)
}

private[sources] class LedgerScan(lo: Int, hi: Int, regions: Int,
    sliceDays: Int, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"LedgerRatesScan days=[$lo,$hi] cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // slice the ORIGINAL day grid and keep only slices intersecting the
    // pushed bounds — whole slices vanish before any reader opens
    val slices = Iterator.from(0).map(i => (i * sliceDays, (i + 1) * sliceDays - 1))
      .takeWhile { case (s, _) => s <= hi }
      .filter { case (_, e) => e >= lo }
      .map { case (s, e) =>
        LedgerSlice(math.max(s, lo), math.min(e, hi), regions): InputPartition
      }.toArray
    LedgerRatesSource.plannedPartitions.set(slices.length)
    slices
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LedgerReaderFactory(required)
}

private[sources] case class LedgerSlice(from: Int, to: Int, regions: Int)
  extends InputPartition

private[sources] class LedgerReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[LedgerSlice]
    new PartitionReader[InternalRow] {
      private var day = s.from
      private var reg = 0
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (day > s.to) return false
        val region = LedgerRatesSource.regionName(reg)
        // emit only the pruned columns, in the required order
        row = InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "day" => day
          case "region" => UTF8String.fromString(region)
          case "rate_pct" => LedgerRatesSource.ratePct(day, region)
        })
        reg += 1
        if (reg == s.regions) { reg = 0; day += 1 }
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
