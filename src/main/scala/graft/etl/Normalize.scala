package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The heart of the reference ETL (reference main.py:188-216): raw insights
  * rows → normalized `fb_stat` rows. Four fused transforms, all Catalyst
  * built-ins (whole-stage-codegen friendly, no UDFs):
  *
  *  - T-PROJ  12-column projection with the `date_start` → `date` rename
  *            (main.py:204-216)
  *  - T-NEST  per-element struct projection keeping exactly
  *            `{action_type, value}`, dropping extra keys (main.py:195-201)
  *  - T-MISS  absent array → empty array, never null — BigQuery
  *            REQUIRED+REPEATED semantics (main.py:192-193)
  *  - T-CAST  string → long/double/date load casts that the reference
  *            delegates to BigQuery's insert coercion (main.py:30-32,211-213)
  *
  * Pure `DataFrame => DataFrame`; narrow (no shuffle) at any scale.
  */
object Normalize {

  private val emptyActions: Column =
    array().cast(Schemas.actionArray)

  /** T-NEST + T-MISS for one REPEATED RECORD column. */
  def normActions(c: Column): Column =
    coalesce(
      transform(c, x => struct(
        x.getField("action_type").as("action_type"),
        x.getField("value").as("value"))),
      emptyActions)

  /** Full raw→fb_stat normalization. */
  def apply(raw: DataFrame): DataFrame =
    raw.select(
      to_date(col("date_start"), "yyyy-MM-dd").as("date"),
      col("ad_id"),
      col("ad_name"),
      col("adset_id"),
      col("adset_name"),
      col("campaign_id"),
      col("campaign_name"),
      col("clicks").cast("long").as("clicks"),
      col("impressions").cast("long").as("impressions"),
      col("spend").cast("double").as("spend"),
      normActions(col("conversions")).as("conversions"),
      normActions(col("actions")).as("actions"))
}
