package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main: run one named query with full stack traces.
  * Usage: runMain graft.Debug <queryName> [sfDir]
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.show(20, truncate = false)
    println(s"[debug] $name rows=${df.count()}")
    spark.stop()
  }
}
