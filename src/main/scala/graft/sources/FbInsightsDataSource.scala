package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
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
  *  - `level='ad'` + `time_increment=1` → [[SupportsPushDownAggregates]]:
  *    the API pre-aggregates per (ad, day) remotely; here count/min/max
  *    grouped by day are answered from line counts + partition names,
  *    without parsing a single JSON document.
  *  - one-day paging  → one [[InputPartition]] per day directory, so a
  *    1000-executor cluster reads 1000 days concurrently and a pruned
  *    query schedules only the matching days.
  *
  * The WRITE half mirrors the reference's sink (`insert_rows_json`,
  * main.py:81-91 + table DDL main.py:44-78): [[SupportsWrite]] with an
  * append-only batch write and create-if-missing. Commit protocol: task
  * writers spool JSONL into a per-query `_tmp-*` directory; only files
  * named in committed task messages are moved into their `date=*`
  * partition dirs by the driver's job commit, so speculative or failed
  * task attempts never become visible. Across job re-runs the sink is
  * at-least-once, exactly like `insert_rows_json` (no dedup key — Q-IDEM
  * semantics).
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

  /** Malformed lines skipped by permissive-mode readers (cumulative). */
  val lastSkippedRows = new java.util.concurrent.atomic.AtomicLong(0)
}

class FbInsightsTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "fb-insights source requires a path option")
  override def name(): String = s"fb_insights($path)"
  override def schema(): StructType = Schemas.fbInsightsRaw
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FbInsightsScanBuilder(path,
      permissive = "permissive".equalsIgnoreCase(options.getOrDefault("mode", "failfast")),
      maxDaysPerBatch = options.getOrDefault("maxDaysPerBatch", "365").toInt)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // K-TBL create-if-missing (reference main.py:63-76): first write
    // creates the table directory; appends attach to the existing layout.
    new java.io.File(path).mkdirs()
    new FbInsightsWriteBuilder(path, info)
  }
}

class FbInsightsScanBuilder(path: String, permissive: Boolean = false,
    maxDaysPerBatch: Int = 365)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var required: StructType = Schemas.fbInsightsRaw
  private var pushed: Array[Filter] = Array.empty
  private var agg: Option[Aggregation] = None
  private var limit: Option[Int] = None

  /** The Graph API scan is cursor-paged — a LIMIT caps how many pages the
    * connector fetches. Partial push: each partition stops parsing after
    * `l` lines; Spark keeps the global limit on top.
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

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

  /** The connector can answer count(*)/count(date_start) and
    * min/max(date_start) without parsing JSON: counts are line counts per
    * day file, min/max dates are the partition directory names. Grouping,
    * if any, must be by date_start — the partition key — so every
    * partition holds exactly one complete group.
    */
  override def pushAggregation(aggregation: Aggregation): Boolean =
    // permissive mode must parse to know which lines are rows — blind
    // line counts would include malformed lines
    if (!permissive && FbInsightsScan.supportedAgg(aggregation)) {
      agg = Some(aggregation); true
    } else false

  /** Complete (no Spark-side final agg) iff grouped by the partition key:
    * day-partitions make the groups disjoint across partitions, so
    * concatenating per-partition results IS the global result. Global
    * (ungrouped) aggregates stay partial — Spark combines the
    * per-partition rows.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    !permissive && FbInsightsScan.supportedAgg(aggregation) &&
      aggregation.groupByExpressions().length == 1

  override def build(): Scan =
    FbInsightsScan(path, required, pushed, agg, limit, permissive, maxDaysPerBatch)
}

case class FbInsightsScan(
    path: String,
    required: StructType,
    pushed: Array[Filter],
    agg: Option[Aggregation],
    limit: Option[Int] = None,
    permissive: Boolean = false,
    maxDaysPerBatch: Int = 365)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  /** Runtime (join-driven) filters — the DSv2 face of dynamic partition
    * pruning: at stage execution Spark hands the scan the build side's
    * date_start values and only the matching day directories are planned.
    */
  private var runtime: Array[Filter] = Array.empty

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("date_start"))

  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter {
      case In("date_start", _) => true
      case f => FbInsightsScan.isDateFilter(f)
    }

  override def readSchema(): StructType = agg match {
    case Some(a) => FbInsightsScan.aggSchema(a)
    case None => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"FbInsightsScan(pushedFilters=${pushed.mkString(",")}, " +
      s"pushedAggregation=${agg.map(a => a.aggregateExpressions.mkString(",")).getOrElse("none")}, " +
      s"pushedLimit=${limit.getOrElse(-1)}, " +
      s"readSchema=${readSchema().fieldNames.mkString(",")})"

  private def admittedDirs(): Array[java.io.File] = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
      .sortBy(_.getName)
      .filter(d => FbInsightsScan.dateAdmitted(d.getName.substring(5), pushed ++ runtime))
  }

  /** PRUNING-AWARE size estimate from file metadata only — what the
    * optimizer (join strategy, AQE) sees. A one-day-filtered scan reports
    * one day's bytes, so it stays broadcastable no matter how large the
    * full table grows. Computed once per Scan (the scan is immutable per
    * pushed-filter set): Spark calls estimateStatistics repeatedly during
    * planning, and re-walking ~2.4k day dirs each time is the tiny-file
    * tax this engine kills everywhere else.
    */
  private lazy val statsBytes: Long = admittedDirs().iterator
    .flatMap(d => d.listFiles().iterator)
    .filter(_.getName.startsWith("part-"))
    .map(_.length())
    .sum

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(statsBytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  /** One day per task is right on a wide cluster (1000 executors read
    * 1000 days concurrently) but floods a small one with tiny tasks
    * (2.4k days × ~25 rows at sf0.1). Bin-pack contiguous days into at
    * most 4×parallelism partitions — the connector's analog of
    * `files.maxPartitionBytes` task-granularity control. Pruning
    * semantics are untouched: only admitted days are binned, and the
    * observability hook still reports admitted DAYS.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val kept = admittedDirs()
    FbInsightsDataSource.lastPlannedPartitions.set(kept.length)
    val days = kept.map { d =>
      val files = d.listFiles().filter(f => f.getName.startsWith("part-")).map(_.getPath)
      FbInsightsDay(d.getName.substring(5), files)
    }
    val parallelism = org.apache.spark.sql.SparkSession.active
      .sparkContext.defaultParallelism
    val maxParts = math.max(1, math.min(days.length, 4 * parallelism))
    val perBin = math.ceil(days.length.toDouble / maxParts).toInt
    days.grouped(math.max(1, perBin))
      .map(bin => FbInsightsPartition(bin): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = agg match {
    case Some(a) => new FbInsightsAggReaderFactory(a)
    case None => new FbInsightsReaderFactory(required, limit, permissive)
  }

  /** Streaming read (MICRO_BATCH_READ): the landing zone consumed as a
    * stream of day-partitions — the connector-native form of the
    * reference's daily incremental loads (main.py:162-181 runs once per
    * day; a streaming connector runs the same day-slices continuously).
    */
  override def toMicroBatchStream(checkpointLocation: String) =
    new FbInsightsMicroBatchStream(path, required, pushed, permissive, maxDaysPerBatch)
}

/** Micro-batch stream over the day-partition directory list. The offset
  * is an index into the date-sorted day list — day directories are
  * append-only in the modeled pipeline (each daily run lands one new
  * `date=*` dir), so a consumed prefix never changes and an index is a
  * valid, replayable offset, exactly like a log position. Admission
  * control ([[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]])
  * caps each micro-batch at `maxDaysPerBatch` days — the connector's
  * `maxFilesPerTrigger`: at 100 TB a restart that finds 2,000 unread days
  * must not plan them as one giant batch. `pushed` filters, when present,
  * prune days BEFORE they enter an offset range — but note Spark's
  * micro-batch planner builds the stream WITHOUT running filter pushdown
  * (it is batch-only), so in practice the array is empty and a Spark-side
  * date filter drops rows after the read; admission control is the
  * operative streaming cap (observed empirically by the restart spec:
  * offsets advance over the full listing even under a `.filter`).
  */
class FbInsightsMicroBatchStream(
    path: String,
    required: StructType,
    pushed: Array[Filter],
    permissive: Boolean,
    maxDaysPerBatch: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit, ReadMaxRows}

  /** `n` = count of consumed days; `last` = the NAME of the last consumed
    * day. The name makes the append-only assumption checkable: if a
    * backfill drops an earlier-dated directory into the listing, every
    * index shifts — planInputPartitions detects the mismatch and fails
    * loudly instead of silently re-reading consumed days and skipping
    * new ones.
    */
  private case class DayIndexOffset(n: Int, last: String) extends StreamOffset {
    override def json(): String = if (last.isEmpty) n.toString else s"$n:$last"
  }

  private def admittedDays(): Array[FbInsightsDay] = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
      .sortBy(_.getName)
      .filter(d => FbInsightsScan.dateAdmitted(d.getName.substring(5), pushed))
      .map { d =>
        val files = d.listFiles().filter(f => f.getName.startsWith("part-")).map(_.getPath)
        FbInsightsDay(d.getName.substring(5), files)
      }
  }

  override def initialOffset(): StreamOffset = DayIndexOffset(0, "")

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val s = start.asInstanceOf[DayIndexOffset].n
    // the admission unit is DAYS: a maxRows limit (incl. our own default)
    // caps days-per-batch; anything else falls back to the option
    val cap = limit match {
      case r: ReadMaxRows => math.min(r.maxRows().toInt, maxDaysPerBatch)
      case _ => maxDaysPerBatch
    }
    val days = admittedDays()
    val n = math.min(s + cap, days.length)
    DayIndexOffset(n, if (n == 0) "" else days(n - 1).date)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxDaysPerBatch.toLong)

  override def deserializeOffset(json: String): StreamOffset =
    json.trim.split(":", 2) match {
      case Array(n) => DayIndexOffset(n.toInt, "")
      case Array(n, last) => DayIndexOffset(n.toInt, last)
    }

  override def planInputPartitions(
      start: StreamOffset, end: StreamOffset): Array[InputPartition] = {
    val endOff = end.asInstanceOf[DayIndexOffset]
    val all = admittedDays()
    // validate the append-only assumption the index offsets rest on
    if (endOff.last.nonEmpty && endOff.n > 0 && endOff.n <= all.length &&
        all(endOff.n - 1).date != endOff.last)
      throw new IllegalStateException(
        s"day list changed under committed offsets: position ${endOff.n - 1} is " +
          s"${all(endOff.n - 1).date}, offset recorded ${endOff.last} — a backfill " +
          "dropped an earlier-dated directory into the landing zone; reset the " +
          "checkpoint or load the backfill through the batch path")
    val days = all.slice(start.asInstanceOf[DayIndexOffset].n, endOff.n)
    if (days.isEmpty) Array.empty
    else {
      // same task-granularity control as the batch scan: bin contiguous
      // days so a wide batch doesn't become thousands of tiny tasks
      val parallelism = org.apache.spark.sql.SparkSession.active
        .sparkContext.defaultParallelism
      val maxParts = math.max(1, math.min(days.length, 4 * parallelism))
      val perBin = math.ceil(days.length.toDouble / maxParts).toInt
      days.grouped(math.max(1, perBin))
        .map(bin => FbInsightsPartition(bin): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FbInsightsReaderFactory(required, None, permissive)

  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
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
    case In(Col, vs) => vs.exists(v => v != null && v.toString == d)
    case IsNotNull(_) => true
    case _ => true
  }

  private def isDateRef(r: Array[NamedReference]): Boolean =
    r.length == 1 && r(0).fieldNames.sameElements(Array(Col))

  private def funcSupported(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case m: Min => isDateRef(m.references())
    case m: Max => isDateRef(m.references())
    case _ => false
  }

  def supportedAgg(a: Aggregation): Boolean = {
    val groupsOk = a.groupByExpressions().toSeq match {
      case Seq() => true
      case Seq(r: NamedReference) => isDateRef(Array(r))
      case _ => false
    }
    groupsOk && a.aggregateExpressions().nonEmpty &&
      a.aggregateExpressions().forall(funcSupported)
  }

  /** Spark maps the scan output positionally: group columns first, then
    * one column per aggregate expression.
    */
  def aggSchema(a: Aggregation): StructType = {
    val groups = a.groupByExpressions().map(_ => StructField(Col, StringType))
    val aggs = a.aggregateExpressions().map {
      case _: CountStar => StructField("count(*)", LongType, nullable = false)
      case _: Min => StructField(s"min($Col)", StringType)
      case _: Max => StructField(s"max($Col)", StringType)
      case other => throw new IllegalStateException(s"unsupported agg $other")
    }
    StructType(groups ++ aggs)
  }
}

case class FbInsightsDay(date: String, files: Array[String])

case class FbInsightsPartition(days: Array[FbInsightsDay]) extends InputPartition

class FbInsightsReaderFactory(
    required: StructType, limit: Option[Int] = None, permissive: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FbInsightsJsonlReader(
      partition.asInstanceOf[FbInsightsPartition], required, limit, permissive)
}

/** Pushed-aggregate reader: one output row per DAY in the partition,
  * computed from file line counts and the day's date value only — the
  * connector-side analog of the API returning pre-aggregated rows.
  * Groups stay disjoint across partitions (a day lives in exactly one
  * bin), so complete pushdown remains sound.
  */
class FbInsightsAggReaderFactory(agg: Aggregation) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val dayIter = partition.asInstanceOf[FbInsightsPartition].days.iterator
      private var current: InternalRow = _

      private def lineCount(d: FbInsightsDay): Long = {
        var n = 0L
        d.files.foreach { f =>
          val src = scala.io.Source.fromFile(f, "UTF-8")
          try src.getLines().foreach(_ => n += 1)
          finally src.close()
        }
        n
      }

      override def next(): Boolean = {
        while (dayIter.hasNext) {
          val d = dayIter.next()
          val count = lineCount(d)
          // a day directory with no rows contributes NO group/partial —
          // a raw scan + Spark aggregate would produce none either (and
          // an empty day must not leak its dir name into min/max)
          if (count > 0) {
            val date = UTF8String.fromString(d.date)
            val groups: Array[Any] = agg.groupByExpressions().map(_ => date: Any)
            val aggs: Array[Any] = agg.aggregateExpressions().map {
              case _: CountStar => count: Any
              case _: Min => date: Any // every row of the day shares the date
              case _: Max => date: Any
              case other => throw new IllegalStateException(s"unsupported agg $other")
            }
            current = new GenericInternalRow(groups ++ aggs)
            return true
          }
        }
        false
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}

/** Line-by-line JSONL reader materializing ONLY the pruned schema —
  * the connector-side analog of the API `fields` list.
  */
class FbInsightsJsonlReader(
    p: FbInsightsPartition, required: StructType,
    limit: Option[Int] = None, permissive: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var emitted = 0
  private val fileIter = p.days.iterator.flatMap(_.files.iterator)
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

  /** FAILFAST (default) mirrors the modeled pipeline: it logs and
    * re-raises on a bad payload. PERMISSIVE is what a production
    * connector adds: skip the malformed line, count it
    * ([[FbInsightsDataSource.lastSkippedRows]]), keep reading — as a
    * LOOP, not recursion: a file of consecutive garbage lines must not
    * grow the stack.
    */
  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) { close(); return false }
    while (advance()) {
      val line = lineIter.next()
      try {
        current = convert(mapper.readTree(line))
        emitted += 1
        return true
      } catch {
        case _: Exception if permissive =>
          FbInsightsDataSource.lastSkippedRows.incrementAndGet()
        case e: Exception =>
          close()
          throw new IllegalArgumentException(
            s"malformed insights JSONL line (mode=failfast): ${line.take(120)}", e)
      }
    }
    close()
    false
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

// ---- write path (K-INS as a connector) --------------------------------

class FbInsightsWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {

  /** The write REQUESTS day-clustered, day-sorted input
    * (`RequiresDistributionAndOrdering`): Spark plans a shuffle on
    * `date_start` + a within-partition sort ahead of the write, so each
    * task owns whole days and the spool emits exactly ONE file per
    * (date, batch) instead of one per (date, input partition) — the
    * small-files problem solved at the SINK's request, the way real
    * table formats (Iceberg's write distribution modes) do it, instead
    * of hoping callers remember to repartition. `requiredNumPartitions`
    * stays 0 so AQE still sizes the shuffle.
    */
  override def build(): Write = new Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
    import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
    import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder}
    override def requiredDistribution(): Distribution =
      Distributions.clustered(Array(Expressions.identity("date_start")))
    override def requiredNumPartitions(): Int = 0
    override def requiredOrdering(): Array[SortOrder] =
      Array(Expressions.sort(Expressions.identity("date_start"),
        SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))
    override def toBatch: BatchWrite =
      new FbInsightsBatchWrite(path, info.schema(), info.queryId())
    override def toStreaming:
        org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new FbInsightsStreamingWrite(path, info.schema(), info.queryId())
  }
}

/** Streaming half of the sink (STREAMING_WRITE): per micro-batch epoch,
  * task writers spool JSONL exactly like the batch path and the driver's
  * `commit(epochId, …)` moves only committed-task files into their
  * `date=*` partitions — so each epoch is all-or-nothing visible and a
  * failed epoch leaves the table unchanged. Epochs run sequentially per
  * query, so dropping the spool after each epoch commit also sweeps any
  * failed speculative attempts of that epoch. Across query RESTARTS the
  * sink is at-least-once (a re-run epoch re-appends), the same contract
  * as the reference's `insert_rows_json` and the batch sink (Q-IDEM).
  */
class FbInsightsStreamingWrite(path: String, schema: StructType, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  private val tmpRoot = s"$path/_tmp-$queryId"
  private val mover = new FbInsightsBatchWrite(path, schema, queryId)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new FbInsightsStreamingWriterFactory(tmpRoot, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    mover.commit(messages)

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    mover.abort(messages)
}

class FbInsightsStreamingWriterFactory(tmpRoot: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    // file names are UUID-unique, so epochs never collide in the spool
    new FbInsightsJsonlWriter(tmpRoot, schema, partitionId, taskId)
}

/** One committed file per (task, day): `(date, tempFile, finalName)`. */
case class FbInsightsCommitMessage(files: Seq[(String, String, String)])
    extends WriterCommitMessage

class FbInsightsBatchWrite(path: String, schema: StructType, queryId: String)
    extends BatchWrite {

  private val tmpRoot = s"$path/_tmp-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FbInsightsWriterFactory(tmpRoot, schema)

  /** Job commit: move exactly the files named by committed tasks from the
    * temp spool into their `date=*` dirs, then drop the spool (taking any
    * uncommitted speculative-attempt files with it). Rows become visible
    * only here — a failed job leaves the table unchanged.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case FbInsightsCommitMessage(files) =>
        files.foreach { case (date, tmpFile, finalName) =>
          val dir = Paths.get(path, s"date=$date")
          Files.createDirectories(dir)
          Files.move(Paths.get(tmpFile), dir.resolve(finalName),
            StandardCopyOption.ATOMIC_MOVE)
        }
      case other => throw new IllegalStateException(s"unexpected message $other")
    }
    dropTmp()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = dropTmp()

  private def dropTmp(): Unit = {
    val root = Paths.get(tmpRoot)
    if (Files.exists(root)) {
      Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }
}

class FbInsightsWriterFactory(tmpRoot: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FbInsightsJsonlWriter(tmpRoot, schema, partitionId, taskId)
}

/** Serializes each InternalRow to one JSON document per line, spooled per
  * day into a task-private temp file. Null fields are OMITTED (like
  * `to_json` and the Graph API): the read side turns absent keys back
  * into nulls, so write→read round-trips exactly.
  */
class FbInsightsJsonlWriter(tmpRoot: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val dateIdx = schema.fieldIndex("date_start")
  // date -> (open writer, temp path, final name)
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, (java.io.BufferedWriter, java.nio.file.Path, String)]

  private def writerFor(date: String) = open.getOrElseUpdate(date, {
    val dir = Paths.get(tmpRoot, s"task-$partitionId-$taskId")
    Files.createDirectories(dir)
    val name = s"part-w$partitionId-$taskId-${java.util.UUID.randomUUID()}.txt"
    val p = dir.resolve(name)
    (Files.newBufferedWriter(p, java.nio.charset.StandardCharsets.UTF_8), p, name)
  })

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(dateIdx), "date_start is required for partitioning")
    val date = row.getUTF8String(dateIdx).toString
    val (w, _, _) = writerFor(date)
    w.write(toJson(row))
    w.write('\n')
  }

  private def toJson(row: InternalRow): String = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case StringType =>
          node.put(f.name, row.getUTF8String(i).toString)
        case ArrayType(st: StructType, _) =>
          val arr = node.putArray(f.name)
          val data = row.getArray(i)
          (0 until data.numElements()).foreach { j =>
            val el = data.getStruct(j, st.fields.length)
            val obj = arr.addObject()
            st.fields.zipWithIndex.foreach { case (sf, k) =>
              if (!el.isNullAt(k)) obj.put(sf.name, el.getUTF8String(k).toString)
            }
          }
        case other => throw new IllegalStateException(s"unexpected type $other")
      }
    }
    mapper.writeValueAsString(node)
  }

  override def commit(): WriterCommitMessage = {
    val files = open.toSeq.map { case (date, (w, p, name)) =>
      w.close(); (date, p.toString, name)
    }
    FbInsightsCommitMessage(files)
  }

  override def abort(): Unit = close()
  override def close(): Unit = open.values.foreach { case (w, _, _) =>
    try w.close() catch { case _: java.io.IOException => () }
  }
}
