package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixture tables (TESTDATA.md).
  * All graft queries take `(spark, sfDir)` and resolve inputs here so the
  * same code runs at any scale factor.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader refuses outright. Read it as a raw long (legacy conf) and
    * convert ns → µs with *integer* division (`div`) — a double division
    * would lose precision above 2^53 ns (~104 days of epoch-nanos).
    * DuckDB's ns→µs cast truncates the same way, so timestamps agree.
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir)
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
