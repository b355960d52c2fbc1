package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X-PROFILE: table profiling — the `ANALYZE TABLE` / data-health face:
  * per-column row, null, and exact distinct counts in ONE pass over the
  * table, emitted long-form (one row per column). This is the profile a
  * pipeline reads before trusting a new drop: null fractions say which
  * columns are load-bearing, distincts say which are keys, enums, or
  * free text.
  *
  * The fixture carries no NULLs, so a deterministic null pattern is
  * injected on BOTH engines (value on event_id%17, props on %23 — the
  * x_pii precedent): the null-counting path is real, not vacuously zero.
  *
  * Scale shape: multiple exact `countDistinct`s in one aggregate plan
  * through Spark's Expand (input ×k for k profiled columns) — exact is
  * the ORACLE's requirement here; at 100 TB the same query swaps each
  * `countDistinct` for `approx_count_distinct` (HLL++, one pass, no
  * Expand) and the X-HLL row already grades that sketch's accuracy.
  * Null counters are plain map-side conditional sums either way.
  */
object Profile {

  private val Columns = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  def profile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("value",
        when(col("event_id") % 17 === 0, lit(null)).otherwise(col("value")))
      .withColumn("props",
        when(col("event_id") % 23 === 0, lit(null)).otherwise(col("props")))
    val aggs = Columns.flatMap(c => Seq(
      sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    val one = ev.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val pairs = array(Columns.map(c => struct(
      lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_null"),
      col(s"${c}__distinct").as("n_distinct"))): _*)
    one.select(col("n_rows"), explode(pairs).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"),
        col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"))
      .orderBy("col_name")
  }

  /** The k of the [[kanon]] re-identification audit: groups smaller than
    * this are "at risk" (the conventional k=5 release threshold).
    */
  val KanonK = 5L

  /** X-KANON: k-anonymity audit of the document corpus before release —
    * treat (lang, source, ⌊n_chars/100⌋) as the quasi-identifier tuple
    * and report, per source, how many QI equivalence classes exist, how
    * many are singletons, how many documents sit in classes smaller than
    * k=[[KanonK]] (the re-identifiable population a release review
    * reads), and the min/max class size. A dataset published with
    * singleton QI classes can be joined back to individuals by anyone
    * holding the same quasi-identifiers — this is the audit that says so
    * BEFORE the data ships.
    *
    * Scale shape: one partial+final aggregation from facts onto QI
    * classes (the only corpus-sized shuffle, carrying 8-byte counts),
    * then a dimension-sized rollup of class rows per source. Exact
    * integers end to end.
    */
  def kanon(spark: SparkSession, sfDir: String): DataFrame = {
    val qi = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("class_size"))
    qi.groupBy("source").agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("class_size") === 1L, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("class_size") < KanonK, col("class_size")).otherwise(0L))
          .as("at_risk_docs"),
        min("class_size").as("min_class"),
        max("class_size").as("max_class"))
      .orderBy("source")
  }
}
