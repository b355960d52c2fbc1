package graft

import org.apache.spark.sql.SparkSession

/** Dev main: run a SQL statement with the graft functions registered.
  * Usage: runMain graft.SqlShell "SELECT rolling_hash('abc')"
  */
object SqlShell {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
    args.foreach(sql => spark.sql(sql).show(50, truncate = false))
    spark.stop()
  }
}
