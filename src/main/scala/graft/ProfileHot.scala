package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling main: the bench's hottest queries, timed warm (second run)
  * like the bench's timed pass, plus formatted plans on demand.
  */
object ProfileHot {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("x_range_join", "q_topk", "q_join_fx_asof", "q_window", "x_retention", "x_stream_daily", "q_load_fb")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        (!sys.env.contains("GRAFT_NOAQE")).toString) // A/B knob
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_JOBLOG: print one line per Spark job (duration + first stage
    // name) — where a query's wall clock goes when the suspect is job
    // scheduling rather than data
    if (sys.env.contains("GRAFT_JOBLOG")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
          starts.put(js.jobId, (js.time, site))
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
            println(f"[job] ${je.jobId}%5d ${(je.time - t0) / 1e3}%7.3fs  $site")
          }
        }
      })
    }
    queries.EtlQueries.fbStatTable(spark, sfDir).head(1)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm0 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm1 = (System.nanoTime() - t1) / 1e9
      println(f"[hot] $n%-18s first=$warm0%7.2fs  second=$warm1%7.2fs")
    }
    if (sys.env.contains("GRAFT_EXPLAIN")) names.foreach { n =>
      println(s"===== $n ====="); SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
