package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A native DataSource V2 table: a deterministic synthetic "ledger" of
  * `rows` records (id, bucket = id mod 97, day = id mod 365,
  * units = id·2654435761 mod 1e6), planned as `slices` disjoint id-range
  * input partitions. The point is the ENGINE plumbing, done the way a real
  * connector must do it at 100 TB:
  *
  *   - **Filter pushdown** (`SupportsPushDownFilters`): comparisons on
  *     `bucket`/`day`/`id` and IsNotNull are accepted and evaluated inside
  *     the partition reader — rows failing them are never materialized into
  *     InternalRows, the DSv2 equivalent of parquet row-group skipping.
  *     Anything else is returned as a residual for Spark to evaluate.
  *   - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *     emits exactly the pruned schema in Spark's requested field order —
  *     a `select(sum(units))` never computes the other columns.
  *   - **Range planning**: ceil-divided contiguous id slices, so executors
  *     get near-equal work with zero coordination — the `spark.range`
  *     strategy generalized to a filtered, multi-column source.
  *
  * No DataSourceRegister (that needs a META-INF/services file); callers use
  * the fully-qualified class name: `spark.read.format("graft.sources.RangeLedger")`.
  * The scan's `description()` exposes pushed filters + read schema so plan
  * tests (and humans reading `.explain`) can see what reached the source.
  */
class RangeLedger extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeLedger.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeLedgerTable(
      properties.getOrDefault("rows", "1000000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object RangeLedger {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("units", LongType, nullable = false)))

  private[sources] def bucketOf(i: Long): Int = (i % 97L).toInt
  private[sources] def dayOf(i: Long): Int = (i % 365L).toInt
  private[sources] def unitsOf(i: Long): Long = (i * 2654435761L) % 1000000L

  private[sources] def colValue(i: Long, name: String): Long = name match {
    case "id"     => i
    case "bucket" => bucketOf(i).toLong
    case "day"    => dayOf(i).toLong
    case "units"  => unitsOf(i)
  }

  /** Can this v1 Filter be evaluated at the source? (All four columns are
    * non-null longs-or-ints, so IsNotNull is trivially true and any
    * comparison against a numeric literal is computable per id.)
    */
  private[sources] def pushable(f: Filter): Boolean = f match {
    case IsNotNull(c)                 => schema.fieldNames.contains(c)
    case EqualTo(c, v: Number)        => schema.fieldNames.contains(c) && v != null
    case LessThan(c, v: Number)       => schema.fieldNames.contains(c) && v != null
    case LessThanOrEqual(c, v: Number) => schema.fieldNames.contains(c) && v != null
    case GreaterThan(c, v: Number)    => schema.fieldNames.contains(c) && v != null
    case GreaterThanOrEqual(c, v: Number) => schema.fieldNames.contains(c) && v != null
    case _                            => false
  }

  private[sources] def eval(f: Filter, i: Long): Boolean = f match {
    case IsNotNull(_)              => true
    case EqualTo(c, v: Number)     => colValue(i, c) == v.longValue()
    case LessThan(c, v: Number)    => colValue(i, c) < v.longValue()
    case LessThanOrEqual(c, v: Number) => colValue(i, c) <= v.longValue()
    case GreaterThan(c, v: Number) => colValue(i, c) > v.longValue()
    case GreaterThanOrEqual(c, v: Number) => colValue(i, c) >= v.longValue()
    case _                         => true
  }
}

private[sources] class RangeLedgerTable(rows: Long, slices: Int)
    extends Table with SupportsRead {
  override def name(): String = s"range_ledger($rows)"
  override def schema(): StructType = RangeLedger.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeLedgerScanBuilder(rows, slices)
}

private[sources] class RangeLedgerScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeLedger.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(RangeLedger.pushable)
    pushed = accepted
    residual // Spark must still evaluate these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RangeLedgerScan(rows, slices, pushed, required)
}

private[sources] case class RangeLedgerSlice(lo: Long, hi: Long) extends InputPartition

private[sources] class RangeLedgerScan(
    rows: Long, slices: Int, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RangeLedger rows=$rows slices=$slices " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + slices - 1) / slices
    (0 until slices).map { k =>
      RangeLedgerSlice(k * per, math.min((k + 1) * per, rows))
    }.filter(s => s.lo < s.hi).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RangeLedgerReaderFactory(pushed, required.fieldNames)
}

/** Explicit case class (not a SAM lambda) — it is serialized to executors. */
private[sources] case class RangeLedgerReaderFactory(
    pushed: Array[Filter], cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RangeLedgerSlice]
    new PartitionReader[InternalRow] {
      private var i = slice.lo - 1
      override def next(): Boolean = {
        i += 1
        // source-side filtering: skip non-matching ids without
        // materializing a row (the pushdown payoff)
        while (i < slice.hi && !pushed.forall(RangeLedger.eval(_, i))) i += 1
        i < slice.hi
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id"     => i
          case "bucket" => RangeLedger.bucketOf(i)
          case "day"    => RangeLedger.dayOf(i)
          case "units"  => RangeLedger.unitsOf(i)
        })
      override def close(): Unit = ()
    }
  }
}
