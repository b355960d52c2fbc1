package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame

/** Shared drain-a-stream-into-parquet machinery for the synchronous
  * streaming queries (streamingDaily, streamingSessions, qStreamLoad):
  * append-mode file sink + checkpoint, drained with processAllAvailable,
  * then read back as a batch DataFrame.
  */
object Drain {

  /** Low-level: run `stream` into `outDir` with `ckptDir`, synchronously. */
  def run(stream: DataFrame, outDir: String, ckptDir: String): Unit = {
    val q = stream.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }

  /** Temp-dir variant: drain into `work/out`, then immediately delete the
    * checkpoint and any staged inputs (`alsoDelete`) — they are dead once
    * the drain finishes — and schedule the remaining sink files for
    * JVM-exit cleanup (the returned DataFrame reads them lazily, so they
    * must outlive the call). Without this, every invocation leaked a
    * staged copy of its input plus a checkpoint into the temp dir.
    */
  def toParquet(stream: DataFrame, work: Path, alsoDelete: Seq[Path] = Nil): DataFrame = {
    val outDir = work.resolve("out").toString
    run(stream, outDir, work.resolve("ckpt").toString)
    (work.resolve("ckpt") +: alsoDelete).foreach(deleteRecursively)
    cleanupAtExit(work)
    stream.sparkSession.read.parquet(outDir)
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(f =>
        try Files.deleteIfExists(f) catch { case _: java.io.IOException => () })
    }

  private val exitPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val hook: Thread = {
    val t = new Thread(() => {
      import scala.jdk.CollectionConverters._
      exitPaths.asScala.foreach(deleteRecursively)
    }, "graft-drain-cleanup")
    Runtime.getRuntime.addShutdownHook(t)
    t
  }

  private def cleanupAtExit(p: Path): Unit = { hook; exitPaths.add(p); () }
}
