package graft.sources

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Read-only DSv2 table for persisted ANN index artifacts — the serving
  * face of X-SIM-PQ-SERVE: an IVF-PQ index job persists its artifacts
  * (the encoded corpus keyed by cell id, the codebook) and a SQL-only
  * consumer probes them through the catalog. Registered under the
  * `ann` namespace of [[FbInsightsCatalog]].
  *
  * Storage layout (what `df.write.partitionBy(cell).json(dir)` of the
  * index build job produces): optional single-level partition dirs
  * `<col>=<long>` holding `part-*.json` JSONL files; the partition
  * column is re-injected from the dir name, never stored in rows. The
  * declared schema + partition column persist in `_schema.json` at
  * CREATE time, so a fresh session resolves the table like any other
  * external table.
  *
  * The scale contract is CELL PRUNING: the scan pushes static
  * `cent_id` equality/IN filters AND accepts runtime (join-driven)
  * filters ([[SupportsRuntimeFiltering]]) — when a probe frame joins
  * the index on the cell id, only the probed cells' directories are
  * planned, which is exactly how an ANN store at 100 TB serves a query
  * without touching the corpus. Size estimates come from admitted
  * files only, so a pruned index scan stays broadcastable.
  *
  * Writes go through the build job's own writer (an index is built by
  * a batch job and served read-only); INSERT INTO is deliberately
  * unsupported.
  */
class AnnIndexTable(path: String) extends Table with SupportsRead {
  private lazy val meta = AnnIndexTable.readMeta(path)

  override def name(): String = s"ann_index($path)"
  override def schema(): StructType = meta._1
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AnnIndexScanBuilder(path, meta._1, meta._2)
}

object AnnIndexTable {
  val SchemaFile = "_schema.json"

  /** Observability hook for the pruning spec: partition-directory count
    * planned by the most recent scan (mirrors
    * [[FbInsightsDataSource.lastPlannedPartitions]]).
    */
  val lastPlannedCells = new AtomicInteger(-1)

  /** Observability hook for the filtered-probe specs: every
    * cell-partitioned scan build appends ONE entry — the rendering of
    * its pushed ROW-level filters, "" when it pushed none (attribute
    * predicates the reader applies while parsing — the X-SIM-FILTERED
    * contract that `label = k` reaches the index scan, not a post-scan
    * Filter node). An append log rather than a last-value slot: a query
    * may legitimately build several scans (the prefilter/postfilter
    * comparison builds one filtered and one unfiltered), and a
    * last-value slot would race them AND leak state across queries —
    * tests [[drainPushedRowFilters]] around a query instead.
    */
  private val pushedRowFilterLog =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private[sources] def recordPushedRowFilters(s: String): Unit =
    pushedRowFilterLog.add(s)

  /** Read-and-clear the per-scan row-filter log (test observability). */
  def drainPushedRowFilters(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var x = pushedRowFilterLog.poll()
    while (x != null) { b += x; x = pushedRowFilterLog.poll() }
    b.result()
  }

  /** Persist (schema DDL, partition column) — line 1 the DDL, line 2 the
    * partition column or empty.
    */
  def writeMeta(path: String, schema: StructType, partCol: Option[String]): Unit = {
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(path, SchemaFile),
      (schema.toDDL + "\n" + partCol.getOrElse("")).getBytes("UTF-8"))
  }

  def readMeta(path: String): (StructType, Option[String]) = {
    val lines = new String(
      Files.readAllBytes(Paths.get(path, SchemaFile)), "UTF-8").split("\n", -1)
    (StructType.fromDDL(lines(0)),
      if (lines.length > 1 && lines(1).nonEmpty) Some(lines(1)) else None)
  }
}

class AnnIndexScanBuilder(path: String, full: StructType, partCol: Option[String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Partition-column equality/IN prunes directories; equality/IN on any
    * other LONG column of the schema is accepted as a ROW filter the
    * reader applies while parsing (the filtered-ANN-probe path — a
    * `label = k` predicate never materializes non-matching rows);
    * everything else stays Spark-side.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(f =>
      AnnIndexScan.isPartFilter(partCol, f) ||
        AnnIndexScan.isRowFilter(full, partCol, f))
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val rows = pushed.filter(AnnIndexScan.isRowFilter(full, partCol, _))
    // record EVERY cell-partitioned scan (empty entry when unfiltered) so
    // the drained log reflects exactly this query's scans — no stale
    // value from a prior query; non-partitioned pseudo-tables (the
    // codebook) are excluded for the same reason lastPlannedCells is
    if (partCol.isDefined)
      AnnIndexTable.recordPushedRowFilters(rows.mkString(","))
    AnnIndexScan(path, required, pushed, partCol)
  }
}

case class AnnIndexScan(
    path: String,
    required: StructType,
    pushed: Array[Filter],
    partCol: Option[String])
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (join-driven) filters — the DSv2 dynamic cell pruning: at
    * execution Spark hands the scan the probe side's cell ids and only
    * matching cell directories are planned.
    */
  private var runtime: Array[Filter] = Array.empty

  private val partFilters = pushed.filter(AnnIndexScan.isPartFilter(partCol, _))
  private val rowFilters = pushed.filterNot(AnnIndexScan.isPartFilter(partCol, _))

  override def filterAttributes(): Array[NamedReference] =
    partCol.map(c => Expressions.column(c)).toArray

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter(AnnIndexScan.isPartFilter(partCol, _))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"AnnIndexScan(pushedFilters=${pushed.mkString(",")}, " +
      s"readSchema=${required.fieldNames.mkString(",")})"

  private def admittedCells(): Array[(Long, Array[String])] = {
    val root = new java.io.File(path)
    partCol match {
      case Some(pc) =>
        val prefix = pc + "="
        Option(root.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith(prefix))
          .map { d =>
            // fail with the offending directory NAMED: layout noise (a
            // __HIVE_DEFAULT_PARTITION__ null dir, a stray non-numeric
            // suffix) must not surface as a bare NumberFormatException
            val suffix = d.getName.substring(prefix.length)
            val v = scala.util.Try(suffix.toLong).getOrElse(
              throw new IllegalStateException(
                s"ann index layout at $path contains a non-numeric " +
                  s"partition directory '${d.getName}' for column '$pc' — " +
                  "the index writer emits only LONG cell ids; remove or " +
                  "repair the stray directory"))
            (v, d)
          }
          .sortBy(_._1)
          .filter { case (v, _) =>
            AnnIndexScan.admitted(v, partFilters ++ runtime) }
          .map { case (v, d) => (v, partFiles(d)) }
      case None =>
        Array((0L, partFiles(root)))
    }
  }

  private def partFiles(d: java.io.File): Array[String] =
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getPath).sorted

  /** Pruning-aware size estimate from admitted files only — a probe
    * that runtime-filters to a handful of cells reports a handful of
    * cells' bytes, keeping the index side broadcastable regardless of
    * corpus size (the FbInsightsScan convention).
    */
  private lazy val statsBytes: Long =
    admittedCells().iterator
      .flatMap(_._2.iterator).map(new java.io.File(_).length()).sum

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(statsBytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val kept = admittedCells()
    // hook tracks cell-partitioned scans only (the books table's single
    // pseudo-cell would otherwise clobber the index scan's count)
    if (partCol.isDefined) AnnIndexTable.lastPlannedCells.set(kept.length)
    val parallelism = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism
    val maxParts = math.max(1, math.min(kept.length, 4 * parallelism))
    val perBin = math.ceil(kept.length.toDouble / maxParts).toInt
    kept.grouped(math.max(1, perBin))
      .map(bin => AnnIndexPartition(bin): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AnnIndexReaderFactory(required, partCol, rowFilters)
}

object AnnIndexScan {
  def isPartFilter(partCol: Option[String], f: Filter): Boolean =
    partCol.exists { pc =>
      f match {
        case EqualTo(a, _) => a == pc
        case In(a, _) => a == pc
        case _ => false
      }
    }

  /** A row filter the JSONL reader can apply exactly: equality/IN with
    * numeric values on a LONG non-partition column of the schema.
    */
  def isRowFilter(schema: StructType, partCol: Option[String], f: Filter): Boolean = {
    def longCol(a: String): Boolean =
      !partCol.contains(a) &&
        schema.fields.exists(x => x.name == a && x.dataType == LongType)
    f match {
      case EqualTo(a, v) => longCol(a) && asLong(v).isDefined
      case In(a, vs) => longCol(a) && vs.nonEmpty && vs.forall(asLong(_).isDefined)
      case _ => false
    }
  }

  private[sources] def asLong(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  def admitted(cell: Long, filters: Array[Filter]): Boolean = filters.forall {
    case EqualTo(_, v) => asLong(v).forall(_ == cell)
    case In(_, vs) => vs.exists(v => asLong(v).contains(cell))
    case _ => true
  }
}

case class AnnIndexPartition(cells: Array[(Long, Array[String])])
    extends InputPartition

class AnnIndexReaderFactory(
    required: StructType, partCol: Option[String],
    rowFilters: Array[Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AnnIndexJsonlReader(
      partition.asInstanceOf[AnnIndexPartition], required, partCol, rowFilters)
}

/** Line-by-line JSONL reader materializing only the pruned schema; the
  * partition column is served from the directory name, never parsed.
  * Pushed row filters (long equality/IN) are applied per parsed line
  * BEFORE the row materializes — a null or missing filter column never
  * matches, exactly SQL's `col = k` semantics.
  */
class AnnIndexJsonlReader(
    p: AnnIndexPartition, required: StructType, partCol: Option[String],
    rowFilters: Array[Filter] = Array.empty)
    extends PartitionReader[InternalRow] {

  /** (column, admitted values) per pushed row filter. */
  private val rowPredicates: Array[(String, Set[Long])] = rowFilters.map {
    case EqualTo(a, v) => (a, AnnIndexScan.asLong(v).toSet)
    case In(a, vs) => (a, vs.flatMap(AnnIndexScan.asLong).toSet)
    case other => throw new IllegalStateException(
      s"unsupported pushed row filter $other")
  }

  private def admitsRow(node: JsonNode): Boolean = rowPredicates.forall {
    case (c, allowed) =>
      val v = node.get(c)
      v != null && !v.isNull && v.isNumber && allowed.contains(v.asLong())
  }

  private val mapper = new ObjectMapper()
  private val cellIter = p.cells.iterator
  private var cellValue = 0L
  private var fileIter: Iterator[String] = Iterator.empty
  private var source: scala.io.Source = _
  private var lineIter: Iterator[String] = Iterator.empty
  private var current: InternalRow = _

  private def advance(): Boolean = {
    while (!lineIter.hasNext) {
      if (fileIter.hasNext) {
        if (source != null) source.close()
        source = scala.io.Source.fromFile(fileIter.next(), "UTF-8")
        lineIter = source.getLines()
      } else if (cellIter.hasNext) {
        val (v, files) = cellIter.next()
        cellValue = v
        fileIter = files.iterator
      } else return false
    }
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (!advance()) { close(); return false }
      val node = mapper.readTree(lineIter.next())
      if (admitsRow(node)) { current = convert(node); return true }
    }
    false // unreachable
  }

  private def convert(node: JsonNode): InternalRow = {
    val values = required.fields.map { f =>
      if (partCol.contains(f.name)) { cellValue: Any }
      else {
        val v = node.get(f.name)
        if (v == null || v.isNull) null
        else f.dataType match {
          case LongType => v.asLong(): Any
          case DoubleType => v.asDouble(): Any
          case StringType => UTF8String.fromString(v.asText()): Any
          case ArrayType(LongType, _) =>
            new GenericArrayData(
              v.elements().asScala.map(_.asLong(): Any).toArray): Any
          case ArrayType(DoubleType, _) =>
            new GenericArrayData(
              v.elements().asScala.map(_.asDouble(): Any).toArray): Any
          case other =>
            throw new IllegalStateException(s"unsupported ann column type $other")
        }
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  override def get(): InternalRow = current
  override def close(): Unit =
    if (source != null) { source.close(); source = null }
}
