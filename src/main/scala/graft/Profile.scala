package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main: stage-by-stage timings of the fb_stat read path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($r)")
    }
    time("fbStatTable (ensure)") { queries.EtlQueries.fbStatTable(spark, sfDir).head(1).length }
    val tbl = queries.EtlQueries.fbStatTable(spark, sfDir)
    time("tbl.count") { tbl.count() }
    time("tbl.count again") { tbl.count() }
    time("scan all cols (sum clicks)") { tbl.agg(sum("clicks")).head() }
    time("groupBy date,camp agg") {
      tbl.groupBy("date", "campaign_id").agg(sum("clicks")).count()
    }
    time("q_daily full") { queries.EtlQueries.qDaily(spark, sfDir).count() }
    time("q_daily again") { queries.EtlQueries.qDaily(spark, sfDir).count() }
    time("q_join_fx full") { queries.EtlQueries.qJoinFx(spark, sfDir).count() }
    time("explode actions") {
      tbl.select(explode_outer(col("actions"))).count()
    }
    import org.apache.spark.sql.types.DecimalType
    time("agg decimal, no orderBy") {
      tbl.groupBy("date", "campaign_id", "campaign_name")
        .agg(sum("clicks"), sum("impressions"),
          sum(col("spend").cast(DecimalType(18, 2))).cast("double")).count()
    }
    time("agg cents(long), no orderBy") {
      tbl.groupBy("date", "campaign_id", "campaign_name")
        .agg(sum("clicks"), sum("impressions"),
          (sum(round(col("spend") * 100).cast("long")).cast("double") / 100.0)).count()
    }
    // TopKPerKey edge probes: k exceeding group size must emit whole
    // groups ranked; k=1 exactly one row per key
    time("topk k=1000 (whole groups)") {
      val d = tbl.groupBy("date", "campaign_id")
        .agg(sum("clicks").as("c"))
      val n = plans.TopKPerKey(d, Seq("date"), Seq(("c", true), ("campaign_id", false)), 1000).count()
      val base = d.count()
      require(n == base, s"k>groupsize must keep all rows: $n vs $base")
      n
    }
    time("topk k=1 (one per key)") {
      val d = tbl.groupBy("date", "campaign_id").agg(sum("clicks").as("c"))
      val n = plans.TopKPerKey(d, Seq("date"), Seq(("c", true), ("campaign_id", false)), 1).count()
      val keys = d.select("date").distinct().count()
      require(n == keys, s"k=1 must emit one row per key: $n vs $keys")
      n
    }
    time("agg cents + orderBy") {
      tbl.groupBy("date", "campaign_id", "campaign_name")
        .agg(sum("clicks"), sum("impressions"),
          (sum(round(col("spend") * 100).cast("long")).cast("double") / 100.0).as("s"))
        .orderBy("date", "campaign_id").count()
    }
    spark.stop()
  }
}
