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
      properties.getOrDefault("slices", "8").toInt,
      Option(properties.get("batchRows")).map(_.toLong))
}

object RangeLedger {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false),
    StructField("units", LongType, nullable = false)))

  private[sources] def bucketOf(i: Long): Int = (i % 97L).toInt
  private[sources] def dayOf(i: Long): Int = (i % 365L).toInt
  /** id·2654435761 mod 1e6, computed in residues so the product never
    * overflows signed 64-bit: (a·b) mod m ≡ ((a mod m)·(b mod m)) mod m,
    * and (1e6−1)·(2654435761 mod 1e6) ≈ 4.4e11 ≪ 2^63. Identical to the
    * naive multiply for every id below the old ~3.47e9 overflow bound,
    * and honors the documented contract above it (r8 advice). */
  private[sources] def unitsOf(i: Long): Long =
    Math.floorMod((i % 1000000L) * (2654435761L % 1000000L), 1000000L)

  private[sources] def colValue(i: Long, name: String): Long = name match {
    case "id"     => i
    case "bucket" => bucketOf(i).toLong
    case "day"    => dayOf(i).toLong
    case "units"  => unitsOf(i)
  }

  /** A literal the reader may compare via longValue() without changing
    * semantics: integral types only, or a floating/decimal value that is
    * exactly integral. Fractional literals (EqualTo(bucket, 5.5)) must stay
    * RESIDUAL — DSv2 does not re-check filters the source claims, so a
    * truncating longValue() here would silently match the wrong rows
    * (r8 advice). */
  private[sources] def integralLiteral(v: Any): Boolean = v match {
    case null => false
    case _: java.lang.Byte | _: java.lang.Short |
         _: java.lang.Integer | _: java.lang.Long => true
    case n: java.math.BigDecimal => n.stripTrailingZeros.scale <= 0
    case n: Number => n.doubleValue() == n.longValue().toDouble
    case _ => false
  }

  /** Can this v1 Filter be evaluated at the source? (All four columns are
    * non-null longs-or-ints, so IsNotNull is trivially true and any
    * comparison against an INTEGRAL numeric literal is computable per id;
    * fractional literals are left as residuals.)
    */
  private[sources] def pushable(f: Filter): Boolean = f match {
    case IsNotNull(c)                 => schema.fieldNames.contains(c)
    case org.apache.spark.sql.sources.In(c, vs) =>
      schema.fieldNames.contains(c) && vs != null && vs.forall(integralLiteral)
    case EqualTo(c, v: Number)        => schema.fieldNames.contains(c) && integralLiteral(v)
    case LessThan(c, v: Number)       => schema.fieldNames.contains(c) && integralLiteral(v)
    case LessThanOrEqual(c, v: Number) => schema.fieldNames.contains(c) && integralLiteral(v)
    case GreaterThan(c, v: Number)    => schema.fieldNames.contains(c) && integralLiteral(v)
    case GreaterThanOrEqual(c, v: Number) => schema.fieldNames.contains(c) && integralLiteral(v)
    case _                            => false
  }

  /** Runtime filters delivered by Spark during execution (observed by the
    * §5 test; cleared by it before each run). Bounded: appends stop at
    * [[RuntimeFiltersCap]] so a long-lived session re-running the runtime-
    * filter query cannot grow it without limit (r8 advice) — the test
    * clears before each run, so observability is unaffected. */
  private[sources] val RuntimeFiltersCap = 64
  val runtimeFiltersSeen = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private[sources] def eval(f: Filter, i: Long): Boolean = f match {
    case IsNotNull(_)              => true
    case org.apache.spark.sql.sources.In(c, vs) =>
      vs.exists(v => v != null && colValue(i, c) == v.asInstanceOf[Number].longValue())
    case EqualTo(c, v: Number)     => colValue(i, c) == v.longValue()
    case LessThan(c, v: Number)    => colValue(i, c) < v.longValue()
    case LessThanOrEqual(c, v: Number) => colValue(i, c) <= v.longValue()
    case GreaterThan(c, v: Number) => colValue(i, c) > v.longValue()
    case GreaterThanOrEqual(c, v: Number) => colValue(i, c) >= v.longValue()
    case _                         => true
  }
}

private[sources] class RangeLedgerTable(rows: Long, slices: Int,
    batchRows: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"range_ledger($rows)"
  override def schema(): StructType = RangeLedger.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeLedgerScanBuilder(rows, slices, batchRows)
}

private[sources] class RangeLedgerScanBuilder(rows: Long, slices: Int,
    batchRows: Option[Long] = None)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeLedger.schema
  // (op, col) per pushed aggregate, in Spark's requested order
  private var aggs: Seq[(String, String)] = Nil

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(RangeLedger.pushable)
    pushed = accepted
    residual // Spark must still evaluate these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 &&
        RangeLedger.schema.fieldNames.contains(nr.fieldNames.head) =>
        Some(nr.fieldNames.head)
      case _ => None
    }

  /** Partial aggregate pushdown: each slice reader emits ONE pre-aggregated
    * row (count / min / max over its filtered ids) instead of the rows
    * themselves; Spark's final aggregate merges the ≤ `slices` partials
    * (COUNT partials via SUM — the planner rewrites that itself). Only
    * ungrouped COUNT(*) / MIN(col) / MAX(col) are accepted — anything else
    * (AVG, SUM, group-by) returns false and Spark falls back to row scans.
    * supportCompletePushDown stays false: readers are per-slice, so the
    * source can't produce the single global row complete pushdown promises.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    val mapped = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(("count", "id"))
      // every ledger column is non-null, so COUNT(col) ≡ COUNT(*)
      case c: org.apache.spark.sql.connector.expressions.aggregate.Count
          if !c.isDistinct => fieldOf(c.column).map(_ => ("count", "id"))
      case m: Min       => fieldOf(m.column).map(("min", _))
      case m: Max       => fieldOf(m.column).map(("max", _))
      case _            => None
    }
    if (mapped.exists(_.isEmpty)) return false
    aggs = mapped.flatten
    // the scan's output becomes the aggregate row: count → long, min/max →
    // the column's own type (all four ledger columns are int/long)
    required = StructType(aggs.zipWithIndex.map {
      case (("count", _), i) => StructField(s"agg_$i", LongType, nullable = false)
      case ((_, c), i) =>
        StructField(s"agg_$i", RangeLedger.schema(c).dataType, nullable = true)
    })
    true
  }

  override def build(): Scan =
    new RangeLedgerScan(rows, slices, pushed, required, aggs, batchRows)
}

private[sources] case class RangeLedgerSlice(lo: Long, hi: Long) extends InputPartition

private[sources] class RangeLedgerScan(
    rows: Long, slices: Int, pushed: Array[Filter], required: StructType,
    aggs: Seq[(String, String)] = Nil, batchRows: Option[Long] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required

  /** DPP-style RUNTIME filtering — the fifth connector capability: after a
    * selective join build side materializes, Spark hands the scan an
    * In(id, ...) filter mid-execution; readers then skip every id outside
    * the join's key set BEFORE materializing a row, the DSv2 analog of
    * dynamic partition pruning. Purely an efficiency contract — results
    * are identical with or without the callback, which is why the op
    * stays fully oracled.
    */
  @volatile private var runtime: Array[Filter] = Array.empty
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(filters: Array[Filter]): Unit = {
    val accepted = filters.filter(RangeLedger.pushable)
    runtime = accepted
    accepted.foreach { f =>
      if (RangeLedger.runtimeFiltersSeen.size < RangeLedger.RuntimeFiltersCap)
        RangeLedger.runtimeFiltersSeen.add(f.toString.take(120))
    }
  }

  /** Planner statistics — the connector capability that decides JOIN
    * STRATEGY: with an accurate post-filter row count, Catalyst broadcasts
    * a small ledger side instead of shuffling both inputs. The estimate
    * accounts for the pushed equality/range predicates exactly (the
    * column moduli are known: bucket has period 97, day 365), so a
    * `bucket = k` filter reports ~rows/97 — the selectivity a file source
    * can only guess at. Size = rows × 8 bytes per emitted column.
    */
  override def estimateStatistics(): Statistics = {
    val selectivity = pushed.foldLeft(1.0) { (acc, f) =>
      acc * (f match {
        case EqualTo("bucket", _) => 1.0 / 97.0
        case EqualTo("day", _)    => 1.0 / 365.0
        case EqualTo("id", _)     => 1.0 / math.max(rows, 1).toDouble
        case LessThan("day", v: Number) =>
          math.min(math.max(v.longValue(), 0), 365).toDouble / 365.0
        case GreaterThanOrEqual("day", v: Number) =>
          math.min(math.max(365L - v.longValue(), 0), 365).toDouble / 365.0
        case _ => 1.0
      })
    }
    val estRows = math.max(1L, (rows * selectivity).toLong)
    val width = math.max(1, required.fields.length) * 8L
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(estRows * width)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(estRows)
    }
  }
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RangeLedgerMicroBatch(rows, slices, batchRows.getOrElse(rows),
      pushed, required.fieldNames)
  override def description(): String =
    s"RangeLedger rows=$rows slices=$slices " +
      s"PushedFilters: [${pushed.mkString(", ")}], " +
      (if (aggs.nonEmpty)
        s"PushedAggregates: [${aggs.map { case (o, c) => s"$o($c)" }.mkString(", ")}], "
      else "") +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + slices - 1) / slices
    (0 until slices).map { k =>
      RangeLedgerSlice(k * per, math.min((k + 1) * per, rows))
    }.filter(s => s.lo < s.hi).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (aggs.isEmpty) RangeLedgerReaderFactory(pushed ++ runtime, required.fieldNames)
    else RangeLedgerAggReaderFactory(pushed ++ runtime, aggs)
}

/** Aggregate-pushdown reader: one pre-aggregated row per slice. A slice
  * with zero filtered ids still emits (0, null, null, …) — null partials
  * vanish in Spark's final min/max merge, and the zero count sums away.
  */
private[sources] case class RangeLedgerAggReaderFactory(
    pushed: Array[Filter], aggs: Seq[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val slice = partition.asInstanceOf[RangeLedgerSlice]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = {
        var n = 0L
        val mins = Array.fill[Long](aggs.size)(Long.MaxValue)
        val maxs = Array.fill[Long](aggs.size)(Long.MinValue)
        var i = slice.lo
        while (i < slice.hi) {
          if (pushed.forall(RangeLedger.eval(_, i))) {
            n += 1
            var a = 0
            while (a < aggs.size) {
              val v = RangeLedger.colValue(i, aggs(a)._2)
              if (v < mins(a)) mins(a) = v
              if (v > maxs(a)) maxs(a) = v
              a += 1
            }
          }
          i += 1
        }
        InternalRow.fromSeq(aggs.zipWithIndex.map {
          case (("count", _), _) => n
          case (("min", c), a) =>
            if (n == 0L) null
            else if (RangeLedger.schema(c).dataType == LongType) mins(a)
            else mins(a).toInt
          case (("max", c), a) =>
            if (n == 0L) null
            else if (RangeLedger.schema(c).dataType == LongType) maxs(a)
            else maxs(a).toInt
        })
      }
      override def close(): Unit = ()
    }
  }
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

/** Micro-batch STREAMING face of the ledger (the third connector
  * capability after batch pushdown and aggregate pushdown): offsets are
  * plain id positions, each trigger admits `batchRows` ids (admission
  * control via ReadLimit.maxRows, honored by Trigger.AvailableNow through
  * SupportsTriggerAvailableNow), and a batch's [start, end) range is
  * planned as the same `slices` range partitions the batch scan uses —
  * so one source definition serves both execution modes, the DSv2 design
  * point. Offsets are trivially replayable: planInputPartitions(a, b) is
  * a pure function, which is exactly what exactly-once recovery asks of a
  * source (re-planning a committed range yields identical rows).
  */
private[sources] class RangeLedgerMicroBatch(
    rows: Long, slices: Int, batchRows: Long,
    pushed: Array[Filter], cols: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  private case class LedgerOffset(pos: Long) extends Offset {
    override def json(): String = pos.toString
  }

  override def initialOffset(): Offset = LedgerOffset(0L)
  override def deserializeOffset(json: String): Offset = LedgerOffset(json.toLong)
  override def latestOffset(): Offset = LedgerOffset(rows)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LedgerOffset].pos
    val step = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _               => batchRows
    }
    LedgerOffset(math.min(from + step, rows))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LedgerOffset].pos
    val hi = end.asInstanceOf[LedgerOffset].pos
    if (lo >= hi) Array.empty
    else {
      val per = (hi - lo + slices - 1) / slices
      (0 until slices).map { k =>
        RangeLedgerSlice(lo + k * per, math.min(lo + (k + 1) * per, hi))
      }.filter(s => s.lo < s.hi).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RangeLedgerReaderFactory(pushed, cols)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
