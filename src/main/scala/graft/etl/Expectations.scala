package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X-EXPECTATIONS: declarative data-contract checks — the
  * Great-Expectations / Delta-Live-Tables "expectations" face every
  * production table runs before anything downstream trusts it:
  * uniqueness, domain membership, range, sign, and referential
  * integrity, each reported as (rule, n_checked, n_violations, passed)
  * instead of a job failure (the reference's own gate, main.py:132-143,
  * is the degenerate one-rule version of this: log-and-skip when the
  * rates payload fails its success check).
  *
  * The fixture is clean, so violations are INJECTED deterministically
  * (the x_pii / x_profile pattern): one mirrored CASE per column keyed
  * on `o_orderkey mod {97,101,103,109,113}` — both engines corrupt the
  * identical rows, so every count is exact, including the duplicate-key
  * rule where a hit remaps the key onto its neighbor.
  *
  * Scale shape: every row-local rule folds into ONE partial+final
  * aggregate over the injected frame (violation counting is a sum of
  * indicator columns — one pass however many rules); the referential
  * rule is one broadcast LEFT ANTI count against the customer dim. The
  * per-rule rows come from `stack` over the one aggregate row —
  * metrics-sized, no second scan.
  */
object Expectations {

  val ValidStatuses = Seq("O", "F", "P")
  val DateLo = "1992-01-01"
  val DateHi = "2002-01-01"

  /** Deterministic mirrored corruption of the clean orders fixture. */
  private def injected(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      when(pmod(col("o_orderkey"), lit(113L)) === 0L, col("o_orderkey") + 1L)
        .otherwise(col("o_orderkey")).as("o_orderkey"),
      when(pmod(col("o_orderkey"), lit(103L)) === 0L, -col("o_custkey"))
        .otherwise(col("o_custkey")).as("o_custkey"),
      when(pmod(col("o_orderkey"), lit(97L)) === 0L, lit("X"))
        .otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(pmod(col("o_orderkey"), lit(101L)) === 0L, -col("o_totalprice"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(pmod(col("o_orderkey"), lit(109L)) === 0L,
        lit("1970-01-01").cast("timestamp"))
        .otherwise(col("o_orderdate")).as("o_orderdate"))

  def expectations(spark: SparkSession, sfDir: String): DataFrame = {
    val inj = injected(spark, sfDir)
    val fkViolations = inj
      .join(broadcast(Tables.load(spark, sfDir, "customer").select("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("fk_viol"))
    val agg = inj.agg(
      count(lit(1)).as("n"),
      countDistinct("o_orderkey").as("n_keys"),
      sum(when(!col("o_orderstatus").isin(ValidStatuses.map(lit): _*), 1L)
        .otherwise(0L)).as("status_viol"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("price_viol"),
      sum(when(col("o_orderdate") < lit(DateLo).cast("timestamp") ||
        col("o_orderdate") >= lit(DateHi).cast("timestamp"), 1L)
        .otherwise(0L)).as("date_viol"))
    agg.crossJoin(broadcast(fkViolations))
      .selectExpr(
        """stack(5,
          |  'date_in_range', n, date_viol,
          |  'fk_custkey', n, fk_viol,
          |  'positive_price', n, price_viol,
          |  'status_domain', n, status_viol,
          |  'unique_orderkey', n, n - n_keys
          |) AS (rule, n_checked, n_violations)""".stripMargin)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("rule")
  }
}
