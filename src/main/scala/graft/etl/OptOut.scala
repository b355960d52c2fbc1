package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** X-OPTOUT: suppression-list filtering — the consent/opt-out pass every
  * user-data pipeline runs before anything else (GDPR Art. 21 / CCPA
  * do-not-sell): a fact table is split against a keyed suppression list
  * with LEFT ANTI (kept) and LEFT SEMI (suppressed, for the audit trail)
  * joins. Q-DELETE erases one user from storage; this excludes a LIST of
  * users from a computation — the two governance verbs.
  *
  * The suppression list here is a deterministic slice of the customer dim
  * (c_custkey % 7 — a stand-in for the opt-out table a real pipeline
  * maintains). Scale shape: the list is orders of magnitude smaller than
  * the fact side, so both joins BROADCAST it (spec-asserted) — the fact
  * table is never shuffled to be filtered; kept/suppressed aggregates
  * are partial+final hash aggs. The oracle recomputes both sides with IN
  * / NOT IN — anti/semi must be value-exact, including the audit trail.
  */
object OptOut {

  def optOut(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val optout = Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"))
    val kept = orders
      .join(broadcast(optout), orders("o_custkey") === optout("c_custkey"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("kept_total"))
    val suppressed = orders
      .join(broadcast(optout), orders("o_custkey") === optout("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_suppressed"))
    kept.join(suppressed, Seq("o_orderstatus"), "full_outer")
      .select(col("o_orderstatus"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_suppressed"), lit(0L)).as("n_suppressed"),
        coalesce(col("kept_total"), lit(0.0)).as("kept_total"))
      .orderBy("o_orderstatus")
  }
}
