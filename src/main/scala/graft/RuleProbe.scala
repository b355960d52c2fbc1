package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev main: prove the TopKRewrite optimizer rule fires automatically in a
  * session configured with spark.sql.extensions=GraftExtensions.
  */
object RuleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val daily = queries.EtlQueries.fbStatTable(spark, "/root/testdata/sf0.001")
      .groupBy("date", "campaign_id").agg(sum("clicks").as("c"))
    val topk = daily
      .withColumn("rn", row_number().over(
        Window.partitionBy("date").orderBy(desc("c"), asc("campaign_id"))))
      .filter(col("rn") <= 3)
    val opt = topk.queryExecution.optimizedPlan.toString
    println("[probe] optimized plan uses TopKPerKey: " + opt.contains("TopKPerKey"))
    println("[probe] rows=" + topk.count())
    topk.orderBy("date", "rn").show(4)
    spark.stop()
  }
}
