package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.Tables

/** Q-LOAD-CSV: schema-on-read CSV ingestion with PERMISSIVE bad-record
  * capture — the delimited-file half of a load surface (the reference's
  * storage API accepts CSV uploads the same way it accepts JSON; the
  * connector's JSONL spool covers the JSON half).
  *
  * The fixture's `orders` table is staged to CSV ONCE per (sfDir), marker-
  * gated in scratch like the streaming fixtures, plus one deliberately
  * malformed file ([[CorruptLines]] short rows behind a header). The load
  * then demonstrates the production contract:
  *
  *  - explicit schema (never inferSchema — an extra full scan at 100 TB),
  *  - PERMISSIVE mode routing malformed rows into `_corrupt_record`
  *    instead of failing the job or silently dropping them,
  *  - quoted-field round-trip (priority strings keep embedded spaces;
  *    the writer quotes, the reader unquotes),
  *  - lossless type round-trips: longs, shortest-repr doubles (Java
  *    `Double.toString` → parse is bit-exact), and an explicit
  *    microsecond timestamp format pinned on BOTH write and read so the
  *    checked `min_day` proves the temporal path.
  *
  * The oracle recomputes the aggregate from the ORIGINAL parquet — so the
  * green row proves the whole stage→write→read→parse pipeline is
  * lossless, with the corrupt count pinned to the injected constant.
  */
object CsvIngest {

  val CorruptLines = 3
  private val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** One-time, marker-gated CSV staging of `orders` (+ the corrupt file).
    * Deterministic: content is the fixture table; file COUNT varies with
    * write parallelism but every consumer aggregates the whole directory.
    */
  def csvPath(spark: SparkSession, sfDir: String): String = {
    val dir = Sink.scratchPath(sfDir, "orders_csv")
    val marker = Paths.get(dir, "_STAGED")
    if (!Files.exists(marker)) {
      val orders = Tables.orders(spark, sfDir)
      orders.repartition(4)
        .write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TsFormat)
        .csv(dir)
      val header = orders.schema.fieldNames.mkString(",")
      val bad = (1 to CorruptLines).map(i => s"corrupt-line-$i").mkString("\n")
      Files.writeString(Paths.get(dir, "zz_corrupt.csv"), s"$header\n$bad\n")
      Files.createFile(marker)
    }
    dir
  }

  /** The checked load: per-status counts + exact-decimal revenue + the
    * min order day (timestamp round-trip witness) + the corrupt-row
    * count riding along as a broadcast one-row column.
    */
  def qCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = csvPath(spark, sfDir)
    // With column pruning (the default) corruption is PROJECTION-DEPENDENT:
    // a consumer that never parses the failing column sees a malformed row
    // as clean nulls — the per-status branch here would absorb the bad
    // rows into a NULL-status group while the corrupt counter catches
    // them. Whole-row parsing makes `_corrupt_record` a property of the
    // ROW, which is the only semantics a load-validation contract can
    // promise. (CSV-only conf; parquet scans elsewhere are unaffected.)
    spark.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    val schema = Tables.orders(spark, sfDir).schema.add("_corrupt_record", StringType)
    val raw = spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
    // the conjunction with o_orderkey IS NULL is semantically redundant (a
    // malformed line never yields a parsed long) but required: Spark
    // refuses a query whose only referenced CSV column is the internal
    // corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val corrupt = raw.agg(
      sum(when(col("_corrupt_record").isNotNull && col("o_orderkey").isNull, lit(1L))
        .otherwise(lit(0L))).as("n_corrupt"))
    raw.filter(col("_corrupt_record").isNull)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"),
        min(col("o_orderdate").cast("date")).as("min_day"))
      .crossJoin(broadcast(corrupt))
      .select("o_orderstatus", "n", "total", "min_day", "n_corrupt")
      .orderBy("o_orderstatus")
  }
}
