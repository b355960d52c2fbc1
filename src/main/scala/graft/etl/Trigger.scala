package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** S-MSG + S-B64 + T-DISPATCH (SURVEY.md §2.1/2.2): the Pub/Sub trigger
  * surface. The reference receives a base64-encoded message body that
  * selects the pipeline (`get_facebook` / `get_currency`, reference
  * main.py:96,104,147) plus a string attribute map with an optional
  * `date` override (main.py:99-102 — note the reference's override branch
  * is buggy: it calls `.strftime` on a string; we implement the *intended*
  * semantics: parse `yyyy-MM-dd`, SURVEY.md §2.9).
  *
  * Fixture path: one message per order, body derived deterministically
  * from the order key, encoded and decoded *in-engine* (base64 →
  * unbase64), so the oracle reproduces the whole path with
  * to_base64/from_base64.
  */
object Trigger {

  /** Pub/Sub-shaped messages: base64 body + attributes. */
  def messages(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      base64(
        when(col("o_orderkey") % 3 === 0, lit("get_currency"))
          .otherwise(lit("get_facebook")).cast("binary")).as("data"),
      map(
        lit("table_id"), lit("fb_stat"),
        lit("dataset_id"), lit("graft"),
        lit("project_id"), lit("p1"),
        lit("date"), when(col("o_orderkey") % 5 === 0,
          date_format(col("o_orderdate"), "yyyy-MM-dd"))).as("attributes"))

  /** The `get_currency` attribute surface (reference main.py:104-113):
    * unpack `api_key` / `from_currency` / `to_currency`, build
    * `source = from + to` (T-CONCAT, main.py:113), and resolve the date —
    * the `date` override when present, else YESTERDAY (S-SUBD,
    * main.py:102). `date.today()` is the reference's only
    * nondeterministic input, so the query injects a deterministic
    * "today" (max order date + 1) that the oracle derives identically;
    * the subtraction itself is the reference's `timedelta(1)`.
    */
  def currencyTrigger(spark: SparkSession, sfDir: String): DataFrame = {
    val msgs = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 3 === 0) // the get_currency cohort (as in messages())
      .select(
        map(
          lit("api_key"), concat(lit("key-"), (col("o_orderkey") % 7).cast("string")),
          lit("from_currency"), lit("USD"),
          lit("to_currency"),
          when(col("o_orderkey") % 2 === 0, lit("UAH")).otherwise(lit("EUR")),
          lit("date"), when(col("o_orderkey") % 5 === 0,
            date_format(col("o_orderdate"), "yyyy-MM-dd"))).as("attributes"))
    val today = Tables.orders(spark, sfDir)
      .agg(date_add(max(to_date(col("o_orderdate"))), 1).as("today"))
    msgs.join(broadcast(today))
      .select(
        concat(col("attributes").getItem("from_currency"),
          col("attributes").getItem("to_currency")).as("source"),
        col("attributes").getItem("api_key").as("api_key"),
        coalesce(
          to_date(col("attributes").getItem("date"), "yyyy-MM-dd"),
          date_sub(col("today"), 1)).as("resolved"),
        col("attributes").getItem("date").isNull.as("defaulted"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("defaulted"), 0L).otherwise(1L)).as("n_override"),
        sum(when(col("defaulted"), 1L).otherwise(0L)).as("n_defaulted"),
        countDistinct("api_key").as("n_keys"),
        min("resolved").as("min_date"),
        max("resolved").as("max_date"))
      .orderBy("source")
  }

  /** Decode + dispatch: per-pipeline message counts and date-override
    * stats (S-B64 decode, T-DISPATCH routing, T-DATE intended semantics).
    */
  def dispatch(spark: SparkSession, sfDir: String): DataFrame =
    messages(spark, sfDir)
      .select(
        unbase64(col("data")).cast("string").as("pipeline"),
        // S-FMTS: the reference's "{}.{}.{}" table-ref templating
        // (main.py:47,58,63,83) — project.dataset.table from attributes
        format_string("%s.%s.%s",
          col("attributes").getItem("project_id"),
          col("attributes").getItem("dataset_id"),
          col("attributes").getItem("table_id")).as("table_ref"),
        to_date(col("attributes").getItem("date"), "yyyy-MM-dd").as("date_override"))
      .groupBy("pipeline", "table_ref")
      .agg(
        count(lit(1)).as("n"),
        count(col("date_override")).as("n_with_date"),
        min("date_override").as("min_override"),
        max("date_override").as("max_override"))
      .orderBy("pipeline")
}
