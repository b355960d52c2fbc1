package graft.etl

import org.apache.spark.sql.types._

/** Schema system of the reference ETL, re-expressed as Spark `StructType`s.
  *
  * The reference declares two fixed BigQuery schemas in code and enforces
  * them at table creation (reference main.py:16-20 `schema_exchange_rate`,
  * main.py:22-40 `schema_facebook_stat`). All top-level fields are REQUIRED
  * (non-nullable); `conversions`/`actions` are REPEATED RECORDs of
  * `{action_type STRING, value STRING}` (main.py:33-38). No schema inference
  * anywhere — we mirror that: explicit StructTypes, never `inferSchema`.
  */
object Schemas {

  /** One element of `actions` / `conversions` after normalization
    * (reference main.py:197,201 keeps exactly these two keys).
    */
  val actionEntry: StructType = StructType(Seq(
    StructField("action_type", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  val actionArray: ArrayType = ArrayType(actionEntry, containsNull = false)

  /** Raw Facebook Ads Insights row as the Graph API returns it
    * (reference main.py:162-181): every metric is a STRING — the reference
    * passes them through untouched (main.py:211-213) and relies on
    * BigQuery's load-time coercion; our load path applies the casts
    * explicitly in [[Normalize]]. Elements of `actions`/`conversions` may
    * carry extra keys (here `1d_view`) that normalization must drop, and
    * the arrays may be absent entirely (main.py:192-201).
    */
  val fbInsightsRaw: StructType = StructType(Seq(
    StructField("date_start", StringType),
    StructField("date_stop", StringType),
    StructField("account_id", StringType),
    StructField("ad_id", StringType),
    StructField("ad_name", StringType),
    StructField("adset_id", StringType),
    StructField("adset_name", StringType),
    StructField("campaign_id", StringType),
    StructField("campaign_name", StringType),
    StructField("clicks", StringType),
    StructField("impressions", StringType),
    StructField("spend", StringType),
    StructField("actions", ArrayType(StructType(Seq(
      StructField("action_type", StringType),
      StructField("value", StringType),
      StructField("1d_view", StringType))))),
    StructField("conversions", ArrayType(StructType(Seq(
      StructField("action_type", StringType),
      StructField("value", StringType)))))))

  /** Normalized `fb_stat` target table (reference main.py:22-40).
    * `spend` is DoubleType (BigQuery FLOAT, not NUMERIC) and action `value`
    * stays STRING — fidelity to the reference's lexical money semantics.
    */
  val fbStat: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("ad_id", StringType, nullable = false),
    StructField("ad_name", StringType, nullable = false),
    StructField("adset_id", StringType, nullable = false),
    StructField("adset_name", StringType, nullable = false),
    StructField("campaign_id", StringType, nullable = false),
    StructField("campaign_name", StringType, nullable = false),
    StructField("clicks", LongType, nullable = false),
    StructField("impressions", LongType, nullable = false),
    StructField("spend", DoubleType, nullable = false),
    StructField("conversions", actionArray, nullable = false),
    StructField("actions", actionArray, nullable = false)))

  /** `exchange_rate` target table (reference main.py:16-20). */
  val exchangeRate: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("currencies", StringType, nullable = false),
    StructField("rate", DoubleType, nullable = false)))

  /** Clustering layout of `fb_stat` (reference main.py:42,72-73). */
  val fbClusteringCols: Seq[String] = Seq("campaign_id", "campaign_name")

  /** Day-partitioning column of both tables (reference main.py:67-70). */
  val partitionCol: String = "date"
}

/** Typed API-boundary case classes (Dataset[T] views over the DataFrames). */
case class ActionEntry(action_type: String, value: String)

case class FbAdStat(
    date: java.sql.Date,
    ad_id: String, ad_name: String,
    adset_id: String, adset_name: String,
    campaign_id: String, campaign_name: String,
    clicks: Long, impressions: Long, spend: Double,
    conversions: Seq[ActionEntry], actions: Seq[ActionEntry])

case class ExchangeRate(date: java.sql.Date, currencies: String, rate: Double)
