package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) DataFrame memoizer. Returning the SAME DataFrame
  * instance matters twice over: the file index / analysis work happens
  * once, and `.cache()` entries are keyed by plan — a freshly built plan
  * would be a distinct cache entry that recomputes. Pinning the session
  * reference for the JVM lifetime is intended: this is a long-lived
  * engine process and its tables/dims are meant to stay hot.
  */
final class Memo {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Build (and optionally cache) the DataFrame once per (session, key). */
  def getOrBuild(spark: SparkSession, key: String, cache: Boolean = false)(
      build: => DataFrame): DataFrame =
    m.computeIfAbsent((spark, key), { _ =>
      val df = build
      if (cache) df.cache()
      df
    })
}
