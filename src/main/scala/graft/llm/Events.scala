package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** X-EVENTS (SURVEY.md §2.7): event-time windowing + sessionization over
  * the `events` table — the Spark-native form of the reference's
  * "micro-batch of one day" cadence (`time_increment: 1`,
  * reference main.py:177-180), generalized to real tumbling and session
  * windows. Batch and Structured-Streaming variants share the same
  * aggregation code.
  */
object Events {

  private val streamRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** Tumbling 1-day event-time windows per event_type (the reference's
    * per-day granularity). Money sums via exact DECIMAL then cast to
    * double (oracle-identical).
    */
  def daily(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("n"), col("total_value"))
      .orderBy("day", "event_type")

  val SessionGap = "30 minutes"

  /** Sessionization: session_window with a 30-minute inactivity gap, then
    * per-user session stats. A new session starts when the gap since the
    * previous event is >= 30 min — mirrored in the oracle via
    * gaps-and-islands (lag + cumulative sum).
    */
  def sessions(spark: SparkSession, sfDir: String): DataFrame = {
    val perSession = Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), SessionGap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    perSession
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"))
      .orderBy("user_id")
  }

  /** Structured-Streaming variant of [[daily]]: same aggregation over a
    * file stream with a watermark, drained synchronously into a memory
    * sink. Produces the identical result as the batch query (same oracle).
    */
  def streamingDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val rawSchema = Tables.eventsRaw(spark, sfDir).schema
    val name = "graft_stream_daily_" + Events.streamRuns.incrementAndGet()
    // the streaming file source wants a directory — scan sfDir, keep only
    // the events table file
    val stream = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(col("w.start").cast("date").as("day"), col("event_type"), col("n"), col("total_value"))
      .orderBy("day", "event_type")
  }

  /** X-HLL: approximate distinct users (HyperLogLog++) vs exact, per
    * event_type. Deterministic for a fixed dataset but engine-specific →
    * rows-only oracle; exactness bound asserted in ScalaTest.
    */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id").as("approx_users"),
        countDistinct("user_id").as("exact_users"),
        approx_count_distinct("event_id").as("approx_events"))
      .orderBy("event_type")
}
