package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.EtlQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator/query from SURVEY.md §2; the
  * matching entry in [[oracleSql]] is ANSI SQL (DuckDB dialect) over the
  * same parquet fixture tables that recomputes the expected result exactly.
  * Column names and types are aligned on both sides (BIGINT for computed
  * ints, DOUBLE for money after exact DECIMAL sums, explicit ORDER BY).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EtlQueries.qJoinFx(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_load_fb" -> (EtlQueries.qLoadFb _),
    "q_load_fx" -> (EtlQueries.qLoadFx _),
    "q_join_fx" -> (EtlQueries.qJoinFx _),
    "q_unnest" -> (EtlQueries.qUnnest _),
    "q_daily" -> (EtlQueries.qDaily _),
    "q_topk" -> (EtlQueries.qTopK _),
    "q_window" -> (EtlQueries.qWindow _),
    "q_prune" -> (EtlQueries.qPrune _),
    "q_idem" -> (EtlQueries.qIdem _),
  )

  /** Shared CTE: the insights-shaped rows FbInsightsSource derives from
    * lineitem×orders, recomputed in SQL (FIXTURES.md §B1 derivation).
    */
  private val fbCte: String =
    """WITH fb AS (
      |  SELECT CAST(o.o_orderdate AS DATE) AS date,
      |         'a-' || l.l_orderkey || '-' || l.l_linenumber AS ad_id,
      |         'ad ' || l.l_orderkey || '-' || l.l_linenumber AS ad_name,
      |         's-' || l.l_suppkey AS adset_id,
      |         'adset ' || l.l_suppkey AS adset_name,
      |         'c-' || (l.l_partkey % 100) AS campaign_id,
      |         'campaign ' || (l.l_partkey % 100) AS campaign_name,
      |         CAST(floor(l.l_quantity) AS BIGINT) AS clicks,
      |         CAST(floor(l.l_quantity) AS BIGINT) * 100 + l.l_linenumber AS impressions,
      |         l.l_extendedprice AS spend,
      |         (l.l_returnflag <> 'N') AS has_actions,
      |         (l.l_linestatus = 'F') AS has_conv,
      |         l.l_linenumber AS ln
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |""".stripMargin

  private val ratesCte: String =
    """rates AS (
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS date,
      |         'USDUAH' AS currencies,
      |         CAST(20 AS DOUBLE)
      |           + CAST((EXTRACT(DAY FROM o_orderdate) * 37
      |                   + EXTRACT(MONTH FROM o_orderdate) * 11) % 100 AS DOUBLE)
      |             / CAST(100 AS DOUBLE) AS rate
      |  FROM orders)
      |""".stripMargin

  private val flatCols: String =
    """date, ad_id, ad_name, adset_id, adset_name, campaign_id, campaign_name,
      |       clicks, impressions, spend,
      |       CAST(CASE WHEN has_actions THEN 2 ELSE 0 END AS BIGINT) AS n_actions,
      |       CAST(CASE WHEN has_conv THEN 1 ELSE 0 END AS BIGINT) AS n_conversions,
      |       CASE WHEN has_actions THEN 'link_click' END AS first_action_type,
      |       CASE WHEN has_actions THEN CAST(clicks AS VARCHAR) END AS first_action_value,
      |       CASE WHEN has_conv THEN CAST(ln AS VARCHAR) END AS first_conv_value""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q_load_fb" ->
      s"""${fbCte}SELECT $flatCols FROM fb ORDER BY ad_id""",
    "q_load_fx" ->
      s"""WITH $ratesCte SELECT date, currencies, rate FROM rates ORDER BY date""",
    "q_join_fx" ->
      s"""$fbCte, $ratesCte
         |SELECT fb.date AS date, ad_id, campaign_id, spend, rate,
         |       spend * rate AS spend_uah
         |FROM fb JOIN rates ON fb.date = rates.date
         |ORDER BY ad_id""".stripMargin,
    "q_unnest" ->
      s"""$fbCte
         |SELECT * FROM (
         |  SELECT 'link_click' AS action_type, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(clicks) AS BIGINT) AS total_value
         |  FROM fb WHERE has_actions
         |  UNION ALL
         |  SELECT 'page_view', CAST(count(*) AS BIGINT), CAST(sum(ln) AS BIGINT)
         |  FROM fb WHERE has_actions
         |  UNION ALL
         |  SELECT NULL, CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT)
         |  FROM fb WHERE NOT has_actions)
         |ORDER BY action_type NULLS FIRST""".stripMargin,
    "q_daily" ->
      s"""$fbCte
         |SELECT date, campaign_id, campaign_name,
         |       CAST(sum(clicks) AS BIGINT) AS clicks,
         |       CAST(sum(impressions) AS BIGINT) AS impressions,
         |       CAST(sum(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS spend
         |FROM fb GROUP BY 1, 2, 3
         |ORDER BY date, campaign_id""".stripMargin,
    "q_topk" ->
      s"""$fbCte
         |SELECT campaign_id,
         |       CAST(sum(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
         |       CAST(sum(clicks) AS BIGINT) AS total_clicks
         |FROM fb GROUP BY 1
         |ORDER BY total_spend DESC, campaign_id LIMIT 10""".stripMargin,
    "q_window" ->
      s"""$fbCte, daily AS (
         |  SELECT date, campaign_id,
         |         CAST(sum(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS spend
         |  FROM fb GROUP BY 1, 2)
         |SELECT date, campaign_id, spend, rn FROM (
         |  SELECT date, campaign_id, spend,
         |         CAST(row_number() OVER (PARTITION BY date
         |                ORDER BY spend DESC, campaign_id) AS BIGINT) AS rn
         |  FROM daily) t
         |WHERE rn <= 3 ORDER BY date, rn""".stripMargin,
    "q_prune" ->
      s"""${fbCte}SELECT $flatCols FROM fb
         |WHERE date = (SELECT min(CAST(o_orderdate AS DATE)) FROM orders)
         |ORDER BY ad_id""".stripMargin,
    "q_idem" ->
      """SELECT CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_first,
        |       CAST(2 * count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_second
        |FROM orders""".stripMargin,
  )
}
