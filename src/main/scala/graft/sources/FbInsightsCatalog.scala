package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.Schemas

/** The catalog face of the insights connector (the DDL half of the
  * reference's BigQuery surface, main.py:44-78): a minimal `TableCatalog`
  * so `CREATE TABLE`, `INSERT INTO`, `SELECT`, and `DROP TABLE` reach the
  * DSv2 table through SQL alone — no `spark.read.format(...)` needed.
  *
  * Register with
  * `spark.sql.catalog.<name> = graft.sources.FbInsightsCatalog` and
  * `spark.sql.catalog.<name>.warehouse = <dir>`; a table named
  * `<name>.<ns>.<tbl>` then lives at `<warehouse>/<ns>/<tbl>` unless its
  * CREATE carried an explicit `LOCATION`. External locations are DURABLE:
  * ident→path persists in `_locations.properties` under the warehouse
  * (written atomically, loaded at initialize), so a fresh session — or a
  * fresh catalog instance in another JVM — resolves external tables the
  * way the reference's BigQuery catalog resolves its datasets. Managed
  * tables need no registry entry (their path derives from the ident).
  *
  * The table schema is the connector's fixed insights schema — a declared
  * schema must match it (the reference enforces its declared BigQuery
  * schema the same way, main.py:63-76).
  */
class FbInsightsCatalog extends TableCatalog with FunctionCatalog {

  // ---- FunctionCatalog face (V2 catalog functions) --------------------
  // The modern extension tier BELOW session extensions: a function the
  // CATALOG itself ships (`SELECT <catalog>.<ns>.poly_hash31(col, 131)`),
  // resolved through the same plugin as its tables — how a warehouse
  // exposes engine-side kernels to plain-SQL users. The bound function
  // declares a magic `invoke(UTF8String, long)` so Spark compiles the
  // call to a direct method invocation inside whole-stage codegen (no
  // row boxing), with `produceResult` as the interpreted fallback.

  /** Catalog functions live in the fixed `db` namespace (matching the
    * warehouse's table namespace convention) — other namespaces fail
    * loudly like the table face does.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(FbInsightsCatalog.FnNamespace))
      Array(
        Identifier.of(namespace, FbInsightsCatalog.FnName),
        Identifier.of(namespace, FbInsightsCatalog.AggFnName))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().sameElements(FbInsightsCatalog.FnNamespace) &&
        ident.name().equalsIgnoreCase(FbInsightsCatalog.FnName))
      FbInsightsCatalog.PolyHash31Unbound
    else if (ident.namespace().sameElements(FbInsightsCatalog.FnNamespace) &&
        ident.name().equalsIgnoreCase(FbInsightsCatalog.AggFnName))
      FbInsightsCatalog.SumCentsUnbound
    else throw new NoSuchFunctionException(ident)

  private var catalogName: String = _
  private var warehouse: String = _
  // external (explicit-LOCATION) tables only; managed paths derive from
  // the ident. Cache of the durable _locations.properties registry — an
  // IMMUTABLE snapshot swapped atomically, so a reader racing a writer
  // sees the old complete view or the new complete view, never a
  // half-populated map (a clear-then-repopulate window would mis-resolve
  // an external table to its managed path mid-write).
  @volatile private var locations: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null,
      s"catalog $name requires spark.sql.catalog.$name.warehouse")
    locations = readDisk()
  }

  private def locationsFile = Paths.get(warehouse, "_locations.properties")

  private def readDisk(): Map[String, String] = {
    val f = locationsFile
    if (!Files.exists(f)) Map.empty
    else {
      val disk = new java.util.Properties()
      val in = Files.newInputStream(f)
      try disk.load(in) finally in.close()
      disk.stringPropertyNames().asScala.map(k => k -> disk.getProperty(k)).toMap
    }
  }

  /** Re-sync the in-memory cache from the durable registry. The file is
    * the source of truth for everything this instance did not just change:
    * a sibling catalog instance over the same warehouse may have added OR
    * dropped entries since this instance initialized, and serving either
    * stale presence or stale absence mis-resolves paths (a drop routed
    * through a stale cache would delete the registry entry yet miss the
    * external directory). Called before every registry-dependent operation
    * — the file is a handful of lines, so the re-read is metadata-cost.
    */
  private def refreshLocations(): Unit = FbInsightsCatalog.registryLock.synchronized {
    locations = readDisk()
  }

  /** Persist the external-location registry: read-RECONCILE-write-then-
    * atomic-move, serialized across instances in this JVM. The durable
    * file is the source of truth plus exactly this call's delta
    * (`added` / `removed`); the in-memory cache is REPLACED by that
    * reconciled view rather than merged over it, so a sibling's drop is
    * never resurrected by this instance's stale cache and a sibling's add
    * is never clobbered — every mutation is routed through here right as
    * it happens, which is what makes "disk + this delta" complete. The
    * atomic move means a reader sees the old complete file or the new
    * complete file, never a torn one.
    */
  private def persistLocations(
      added: Map[String, String] = Map.empty,
      removed: Set[String] = Set.empty): Unit =
    FbInsightsCatalog.registryLock.synchronized {
      val next = (readDisk() -- removed) ++ added
      locations = next
      val props = new java.util.Properties()
      next.foreach { case (k, v) => props.setProperty(k, v) }
      Files.createDirectories(Paths.get(warehouse))
      val tmp = Paths.get(warehouse, "_locations.properties.tmp")
      val out = Files.newOutputStream(tmp)
      try props.store(out, "fb-insights external table locations")
      finally out.close()
      Files.move(tmp, locationsFile,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString("/")

  /** Spark normalizes `LOCATION` clauses to URIs (`file:/tmp/x`); resolve
    * them back to filesystem paths — `Paths.get("file:/x")` would treat
    * the scheme as a RELATIVE directory literally named `file:` and
    * silently write the table under the process cwd.
    */
  private def fsPath(s: String): String =
    try {
      val u = new java.net.URI(s)
      if (u.getScheme == null || u.getScheme == "file") {
        if (u.getPath == null || u.getPath.isEmpty) s else u.getPath
      } else {
        throw new IllegalArgumentException(
          s"fb-insights catalog supports local file locations only, got $s")
      }
    } catch { case _: java.net.URISyntaxException => s }

  private def pathFor(ident: Identifier): String =
    locations.getOrElse(key(ident), s"$warehouse/${key(ident)}")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    refreshLocations()
    val dir = new java.io.File((warehouse +: namespace).mkString("/"))
    val managed = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
    // external tables live outside the warehouse — the registry is their
    // only listing (filter on namespace prefix of the "ns/…/tbl" key)
    val nsPrefix = namespace.mkString("", "/", "/")
    val external = locations.keysIterator.toArray
      .filter(k => k.startsWith(nsPrefix) && !k.drop(nsPrefix.length).contains("/"))
      .map(k => Identifier.of(namespace, k.drop(nsPrefix.length)))
    (managed ++ external).distinct
  }

  override def tableExists(ident: Identifier): Boolean = {
    refreshLocations()
    new java.io.File(pathFor(ident)).isDirectory
  }

  override def loadTable(ident: Identifier): Table = {
    refreshLocations()
    val p = pathFor(ident)
    if (!new java.io.File(p).isDirectory) throw new NoSuchTableException(ident)
    if (ident.namespace().sameElements(FbInsightsCatalog.AnnNamespace))
      new AnnIndexTable(p)
    else new FbInsightsTable(p)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val external = Option(properties.get(TableCatalog.PROP_LOCATION)).map(fsPath)
    val p = external.getOrElse(s"$warehouse/${key(ident)}")
    if (ident.namespace().sameElements(FbInsightsCatalog.AnnNamespace)) {
      // the `ann` namespace serves persisted ANN index artifacts: any
      // declared schema of long/double/string/array<long>/array<double>
      // columns, optionally identity-partitioned by ONE long column
      // (the cell id) — that column is what pruning keys on
      require(schema.nonEmpty, "ann tables must declare a schema")
      val partCol = partitions.toList match {
        case Nil => None
        case t :: Nil =>
          require(t.name == "identity",
            s"ann tables support identity partitioning only, got $t")
          Some(t.references().head.fieldNames().mkString("."))
        case _ => throw new IllegalArgumentException(
          "ann tables support at most one partition column")
      }
      partCol.foreach { c =>
        require(schema.fieldNames.contains(c) &&
            schema(c).dataType == LongType,
          s"ann partition column $c must be a BIGINT column of the schema")
      }
      external.foreach { loc =>
        persistLocations(added = Map(key(ident) -> loc))
      }
      Files.createDirectories(Paths.get(p))
      val metaFile = Paths.get(p, AnnIndexTable.SchemaFile)
      if (!Files.exists(metaFile)) AnnIndexTable.writeMeta(p, schema, partCol)
      else {
        // a re-CREATE over an existing staged index resolves with the
        // PERSISTED meta — silently accepting a different declaration
        // would let declared and effective schema disagree; fail loudly
        val (prevSchema, prevPart) = AnnIndexTable.readMeta(p)
        require(prevSchema.catalogString == schema.catalogString &&
            prevPart == partCol,
          s"ann table at $p already has persisted meta " +
            s"(schema=${prevSchema.toDDL}, partition=$prevPart) that does " +
            s"not match the declared (schema=${schema.toDDL}, " +
            s"partition=$partCol) — drop the staged index or match its " +
            "declaration")
      }
      new AnnIndexTable(p)
    } else {
      // the insights connector's schema is fixed: accept a blank
      // declaration (CTAS / LOCATION-only) or a structural match
      // (catalogString ignores the nullability flags SQL parsing
      // defaults differently), reject anything else loudly
      require(schema.isEmpty ||
          schema.catalogString == Schemas.fbInsightsRaw.catalogString,
        s"fb-insights tables have the fixed insights schema; got ${schema.toDDL}")
      require(partitions.isEmpty,
        "fb-insights tables are always day-partitioned by date_start; " +
          "explicit PARTITIONED BY is not supported")
      external.foreach { loc =>
        // durable: a fresh session must resolve this table
        persistLocations(added = Map(key(ident) -> loc))
      }
      Files.createDirectories(Paths.get(p))
      new FbInsightsTable(p)
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "fb-insights tables have a fixed schema; ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = FbInsightsCatalog.registryLock.synchronized {
    // the whole refresh→resolve→unregister sequence holds the registry
    // lock (reentrant with persistLocations'), so a sibling's concurrent
    // create of the same ident can't land between the path resolution and
    // the removal persist — the path we delete is the path the registry
    // named when we committed to the drop. Cross-JVM remains last-writer.
    refreshLocations()
    val p = Paths.get(pathFor(ident))
    persistLocations(removed = Set(key(ident)))
    if (!Files.isDirectory(p)) false
    else {
      // close the walk stream (it holds directory handles) and tolerate
      // entries vanishing mid-walk — deleteIfExists keeps the drop
      // idempotent instead of failing half-deleted
      val walk = Files.walk(p)
      val entries =
        try walk.iterator().asScala.toSeq.reverse
        finally walk.close()
      entries.foreach(e => Files.deleteIfExists(e))
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = FbInsightsCatalog.registryLock.synchronized {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val to = Paths.get(pathFor(newIdent))
    Files.createDirectories(to.getParent)
    Files.move(Paths.get(pathFor(oldIdent)), to)
    // the data now lives at the new ident's (managed) path
    persistLocations(removed = Set(key(oldIdent)))
    ()
  }
}

object FbInsightsCatalog {
  /** Serializes registry read-reconcile-write cycles across catalog
    * instances in one JVM (the cross-JVM story is the atomic move — last
    * complete write wins, never a torn file).
    */
  private[sources] val registryLock = new Object

  /** Name of the catalog-shipped V2 scalar function. */
  val FnName = "poly_hash31"

  /** Name of the catalog-shipped V2 AGGREGATE function. */
  val AggFnName = "sum_cents"

  /** Fixed namespace catalog functions resolve under. */
  val FnNamespace: Array[String] = Array("db")

  /** Namespace whose tables are [[AnnIndexTable]]s (persisted ANN index
    * artifacts) rather than insights tables.
    */
  val AnnNamespace: Array[String] = Array("ann")

  /** `sum_cents(spend)` — exact money total as a V2 catalog AGGREGATE
    * function: each double rounds to DECIMAL(18,2) cents exactly as the
    * engine's cast does (canonical `BigDecimal.valueOf` representation,
    * HALF_UP — identical on the fixture's 2-decimal money values in any
    * engine), then sums as BIGINT. The state is a single Long and
    * `merge` is addition, so Spark runs it as a PARTIAL aggregate with
    * map-side combine — the mergeable-state contract that makes a
    * catalog aggregate usable over 100 TB, demonstrated beside the
    * scalar [[PolyHash31Bound]] face.
    */
  object SumCentsUnbound extends UnboundFunction {
    override def name(): String = AggFnName
    override def description(): String =
      s"$AggFnName(spend): exact DECIMAL(18,2) cents sum"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == org.apache.spark.sql.types.DoubleType,
        s"$AggFnName(double) got ${inputType.simpleString}")
      SumCentsBound
    }
  }

  object SumCentsBound extends AggregateFunction[java.lang.Long, java.lang.Long] {
    override def inputTypes(): Array[DataType] =
      Array(org.apache.spark.sql.types.DoubleType)
    override def resultType(): DataType = LongType
    override def name(): String = AggFnName
    override def canonicalName(): String = s"graft.$AggFnName"
    // null state = "no non-null input yet" → SQL SUM's NULL on an
    // empty/all-NULL group, matching the oracle's aggregate exactly
    override def newAggregationState(): java.lang.Long = null
    override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) state
      else {
        val v = input.getDouble(0)
        // ANSI cast of a non-finite double to DECIMAL throws; fail as
        // loudly but with the function's name on the error
        if (!java.lang.Double.isFinite(v))
          throw new ArithmeticException(s"$AggFnName: non-finite spend $v")
        val cents = java.math.BigDecimal.valueOf(v)
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
        if (state == null) cents else state + cents
      }
    override def merge(left: java.lang.Long, right: java.lang.Long): java.lang.Long =
      if (left == null) right
      else if (right == null) left
      else left + right
    override def produceResult(state: java.lang.Long): java.lang.Long = state
  }

  /** `poly_hash31(str, base)` — the signature family's 31-bit poly hash
    * as a V2 catalog function, value-identical to the
    * [[graft.functions.PolyHash]] expression (and therefore to the
    * oracle's SQL mirror).
    */
  object PolyHash31Unbound extends UnboundFunction {
    override def name(): String = FnName
    override def description(): String =
      s"$FnName(str, base): 31-bit polynomial codepoint hash"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == StringType &&
        (inputType.fields(1).dataType == LongType ||
          inputType.fields(1).dataType == IntegerType),
        s"$FnName(string, integral) got ${inputType.simpleString}")
      PolyHash31Bound
    }
  }

  object PolyHash31Bound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(StringType, LongType)
    override def resultType(): DataType = LongType
    override def name(): String = FnName
    override def canonicalName(): String = s"graft.$FnName"
    /** Magic method: codegen compiles the call to a direct invoke. */
    def invoke(s: UTF8String, base: Long): Long =
      graft.functions.PolyHashing.polyHash(s, base)
    override def produceResult(input: InternalRow): java.lang.Long =
      invoke(input.getUTF8String(0), input.getLong(1))
  }
}
