package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.Schemas

/** DataSourceV2 connector for Facebook-Ads-Insights-shaped JSONL — the
  * "real connector path" of SURVEY.md §2.1 S-FB.
  *
  * The reference's API scan has three server-side behaviors that map to
  * DSv2 pushdown (reference main.py:162-181):
  *  - `fields=[...]`  → [[SupportsPushDownRequiredColumns]]: only the
  *    requested columns are materialized from JSON;
  *  - `time_range`    → [[SupportsPushDownFilters]]: comparisons on
  *    `date_start` prune whole day-partitions before any read;
  *  - one-day paging  → one [[InputPartition]] per day directory, so a
  *    1000-executor cluster reads 1000 days concurrently and a pruned
  *    query schedules only the matching days.
  *
  * Storage layout: `path/date=YYYY-MM-DD/part-*.txt`, one JSON document
  * per line (what a connector spooling the paged API to blob storage
  * would produce).
  */
class FbInsightsDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.fbInsightsRaw

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new FbInsightsTable(properties.get("path"))
}

object FbInsightsDataSource {
  /** Test/observability hook: day-partitions planned by the last scan. */
  val lastPlannedPartitions = new AtomicInteger(-1)
}

class FbInsightsTable(path: String) extends Table with SupportsRead {
  require(path != null, "fb-insights source requires a path option")
  override def name(): String = s"fb_insights($path)"
  override def schema(): StructType = Schemas.fbInsightsRaw
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FbInsightsScanBuilder(path)
}

class FbInsightsScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = Schemas.fbInsightsRaw
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept date_start comparisons (they prune day directories); leave
    * everything else to Spark.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition(FbInsightsScan.isDateFilter)
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = FbInsightsScan(path, required, pushed)
}

case class FbInsightsScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"FbInsightsScan(pushedFilters=${pushed.mkString(",")}, readSchema=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new java.io.File(path)
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
      .sortBy(_.getName)
    val kept = dirs.filter(d => FbInsightsScan.dateAdmitted(d.getName.substring(5), pushed))
    FbInsightsDataSource.lastPlannedPartitions.set(kept.length)
    kept.map { d =>
      val files = d.listFiles().filter(f => f.getName.startsWith("part-")).map(_.getPath)
      FbInsightsPartition(d.getName.substring(5), files): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FbInsightsReaderFactory(required)
}

object FbInsightsScan {
  private val Col = "date_start"

  def isDateFilter(f: Filter): Boolean = f match {
    case EqualTo(Col, _: String) => true
    case GreaterThan(Col, _: String) => true
    case GreaterThanOrEqual(Col, _: String) => true
    case LessThan(Col, _: String) => true
    case LessThanOrEqual(Col, _: String) => true
    case IsNotNull(Col) => true
    case _ => false
  }

  /** ISO dates compare lexicographically — evaluate pushed predicates
    * directly on the partition-directory date string.
    */
  def dateAdmitted(d: String, pushed: Array[Filter]): Boolean = pushed.forall {
    case EqualTo(_, v: String) => d == v
    case GreaterThan(_, v: String) => d > v
    case GreaterThanOrEqual(_, v: String) => d >= v
    case LessThan(_, v: String) => d < v
    case LessThanOrEqual(_, v: String) => d <= v
    case IsNotNull(_) => true
    case _ => true
  }
}

case class FbInsightsPartition(date: String, files: Array[String]) extends InputPartition

class FbInsightsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FbInsightsJsonlReader(partition.asInstanceOf[FbInsightsPartition], required)
}

/** Line-by-line JSONL reader materializing ONLY the pruned schema —
  * the connector-side analog of the API `fields` list.
  */
class FbInsightsJsonlReader(p: FbInsightsPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val fileIter = p.files.iterator
  // One file handle open at a time; closed when its lines are exhausted
  // and unconditionally in close() — long-lived executors scan many
  // partitions, so leaking a descriptor per file is not an option.
  private var source: scala.io.Source = _
  private var lineIter: Iterator[String] = Iterator.empty
  private var current: InternalRow = _

  private def advance(): Boolean = {
    while (!lineIter.hasNext && fileIter.hasNext) {
      if (source != null) source.close()
      source = scala.io.Source.fromFile(fileIter.next(), "UTF-8")
      lineIter = source.getLines()
    }
    lineIter.hasNext
  }

  override def next(): Boolean =
    if (!advance()) { close(); false }
    else {
      current = convert(mapper.readTree(lineIter.next()))
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit =
    if (source != null) { source.close(); source = null }

  private def convert(node: JsonNode): InternalRow = {
    val values = required.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case StringType => UTF8String.fromString(v.asText())
        case ArrayType(st: StructType, _) => convertArray(v, st)
        case other => throw new IllegalStateException(s"unexpected type $other")
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  private def convertArray(arr: JsonNode, st: StructType): ArrayData =
    new GenericArrayData(arr.elements().asScala.map { el =>
      new GenericInternalRow(st.fields.map { f =>
        val v = el.get(f.name)
        if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
      }.asInstanceOf[Array[Any]])
    }.toArray[Any])
}
