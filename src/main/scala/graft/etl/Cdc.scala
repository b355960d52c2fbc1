package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data-capture apply + copy-on-write maintenance — the mutation
  * half of a lakehouse sink that the reference's append-only
  * `insert_rows_json` (main.py:81-91) delegates to BigQuery. Both
  * operators use a tiny versioned-snapshot commit protocol (numbered
  * snapshot dirs + a `_current` pointer file written last), the miniature
  * of an Iceberg/Delta manifest commit: readers resolve the pointer and
  * never observe a half-written snapshot.
  */
object Cdc {

  private val runs = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def writePointer(root: java.nio.file.Path, version: Long): Unit = {
    // write-then-move so the pointer flip is atomic for readers
    val tmp = root.resolve("_current.tmp")
    java.nio.file.Files.writeString(tmp, version.toString)
    java.nio.file.Files.move(tmp, root.resolve("_current"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private[graft] def currentVersion(root: java.nio.file.Path): Long =
    java.nio.file.Files.readString(root.resolve("_current")).trim.toLong

  /** The foreachBatch body of [[streamUpsert]]: full-outer-merge one
    * micro-batch of change rows into the current snapshot and commit the
    * result as the next version (pointer flips last). Factored out so the
    * restart-recovery spec can drive the SAME merge logic through a
    * stop-mid-stream + resume-from-checkpoint cycle.
    */
  private[graft] def applyChangeBatch(
      spark: SparkSession, snapRoot: java.nio.file.Path)(
      batch: DataFrame, batchId: Long): Unit = {
    val v = currentVersion(snapRoot)
    val cur = spark.read.parquet(snapRoot.resolve(s"v$v").toString)
    val ch = batch
      .withColumnRenamed("currencies", "u_currencies")
      .withColumnRenamed("rate", "u_rate")
    val merged = cur.join(ch, Seq("date"), "full_outer")
      .select(
        col("date"),
        coalesce(col("u_currencies"), col("currencies")).as("currencies"),
        coalesce(col("u_rate"), col("rate")).as("rate"))
    merged.write.parquet(snapRoot.resolve(s"v${v + 1}").toString)
    writePointer(snapRoot, v + 1) // commit: readers flip to v+1
    ()
  }

  /** X-STREAM-UPSERT: a stream of change rows applied to a keyed snapshot
    * with `foreachBatch` — per micro-batch, the current snapshot
    * full-outer-merges the batch's changes on the key and commits as a
    * NEW snapshot version (copy-on-write; the pointer flips only after
    * the write completes). This is how Structured Streaming expresses
    * MERGE targets: the file sink is append-only, so upsert lives in
    * foreachBatch against a versioned table. The change set is q_merge's
    * (rate corrections + five new days, ONE change per key, so the end
    * state is batching-independent); the final snapshot must equal the
    * batch MERGE oracle. At scale the inner merge prunes to the
    * partitions holding the batch's keys — a micro-batch touches few.
    */
  def streamUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory(
      "graft_stream_upsert_" + runs.incrementAndGet() + "_")
    val snapRoot = work.resolve("snap")
    java.nio.file.Files.createDirectories(snapRoot)

    // v0: the current rates snapshot
    val base = RatesSource.rates(spark, sfDir)
    base.write.parquet(snapRoot.resolve("v0").toString)
    writePointer(snapRoot, 0L)

    // the change stream: q_merge's deterministic change set staged as
    // files (update rows for %3 days; five inserted days past the max)
    val maxDate = base.agg(max("date")).head().getDate(0)
    val updates = base
      .filter(dayofmonth(col("date")) % 3 === 0)
      .select(col("date"), col("currencies"), (col("rate") + 0.5).as("rate"))
    val inserts = spark.range(1, 6)
      .select(
        date_add(lit(maxDate), col("id").cast("int")).as("date"),
        lit("USDUAH").as("currencies"),
        (lit(30.0) + col("id").cast("double")).as("rate"))
    val chDir = work.resolve("changes")
    updates.unionByName(inserts).write.parquet(chDir.toString)

    val changes = spark.readStream
      .schema(base.schema)
      .parquet(chDir.toString)

    val q = changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .foreachBatch(applyChangeBatch(spark, snapRoot) _)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val v = currentVersion(snapRoot)
    val out = spark.read.parquet(snapRoot.resolve(s"v$v").toString)
      .orderBy("date")
    // checkpoint is dead now; the snapshot chain must outlive the call
    // (the returned DataFrame reads it lazily) → exit-time cleanup
    graft.streaming.Drain.deleteRecursively(work.resolve("ckpt"))
    graft.streaming.Drain.cleanupAtExit(work)
    out
  }

  /** X-TIME-TRAVEL: version-pinned reads over the snapshot chain — the
    * lakehouse `VERSION AS OF` surface on top of the same numbered-dir +
    * pointer commit protocol streamUpsert writes through. v0 is the
    * original rates load, v1 the post-MERGE state (q_merge's change set);
    * reading BOTH versions side by side is exactly a reproducibility
    * audit ("which rates did yesterday's job see?"). The snapshots are
    * immutable once the pointer moves past them, so a version read needs
    * no locks at any scale — it's a plain parquet scan of a frozen dir.
    */
  def timeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val root = Sink.scratchPath(sfDir, "rates_versioned")
    val marker = java.nio.file.Paths.get(root, "_GRAFT_OK_v1")
    val rootP = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(marker)) {
      Sink.dropUncommitted(root)
      java.nio.file.Files.createDirectories(rootP)
      RatesSource.rates(spark, sfDir)
        .write.parquet(rootP.resolve("v0").toString)
      writePointer(rootP, 0L)
      graft.queries.EtlQueries.qMerge(spark, sfDir)
        .select("date", "currencies", "rate")
        .write.parquet(rootP.resolve("v1").toString)
      writePointer(rootP, 1L) // commit: v1 becomes the current version
      java.nio.file.Files.createFile(marker)
    }
    require(currentVersion(rootP) == 1L, "pointer must be at the latest version")
    def at(v: Long): DataFrame =
      spark.read.parquet(rootP.resolve(s"v$v").toString)
        .withColumn("version", lit(v))
    at(0L).unionByName(at(1L))
      .groupBy("version")
      .agg(
        count(lit(1)).as("n"),
        min("date").as("min_date"),
        max("date").as("max_date"),
        sum(col("rate").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_rate"))
      .orderBy("version")
  }

  /** Q-DELETE: copy-on-write row deletion (the GDPR-erasure shape) over
    * the Z-ordered events copy — delete ONE user's events by rewriting
    * ONLY the files that contain that user, leaving every other file
    * byte-untouched (spec asserts most files survive with their
    * timestamps). The z-order layout is what makes the pruning real:
    * each file covers a bounded (day, user) box, so one user hits few
    * files. Mechanics per affected file: read, anti-filter, write the
    * replacement, then swap — the file-local miniature of a deletion
    * commit (real formats record the same swap in a manifest instead of
    * the directory). The oracle runs the anti-filter over the raw table:
    * deletion must be value-exact, not just row-count-right.
    */
  def delete(spark: SparkSession, sfDir: String): DataFrame = {
    val src = graft.queries.ScaleQueries.zorderLayout(spark, sfDir)
    val dst = Sink.scratchPath(sfDir, "events_zorder_deleted")
    val marker = java.nio.file.Paths.get(dst, "_GRAFT_OK_v2")
    if (!java.nio.file.Files.exists(marker)) {
      Sink.dropUncommitted(dst)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
      val all = spark.read.parquet(src)
      val victim = all.agg(min("user_id")).head().getLong(0) + 3
      // file inventory: which files contain the victim? (at 100 TB this
      // is a footer min/max check against the manifest, no data scan;
      // the z-layout keeps the affected set small either way)
      // input_file_name() yields a (possibly URL-encoded) file: URI;
      // compare decoded filesystem paths, not raw strings, so scratch
      // paths with spaces/special chars still match the listing
      def fsPath(s: String): String =
        try {
          val u = new java.net.URI(s)
          if (u.getPath == null) s else u.getPath
        } catch { case _: java.net.URISyntaxException => s }
      val affected = all
        .filter(col("user_id") === victim)
        .select(input_file_name().as("f")).distinct()
        .collect().map(r => fsPath(r.getString(0))).toSet
      val files = new java.io.File(src).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      if (affected.nonEmpty && !files.exists(affected.contains))
        throw new IllegalStateException(
          s"${affected.size} files contain the victim but none matched the " +
            "directory listing — URI/path normalization mismatch; a silent " +
            "no-op here would leave the victim's rows in place")
      files.foreach { f =>
        val name = new java.io.File(f).getName
        if (affected.contains(f)) {
          spark.read.parquet(f)
            .filter(col("user_id") =!= victim)
            .coalesce(1)
            .write.parquet(s"$dst/rw_$name")
        } else {
          // untouched files carry over as-is (copied here because the
          // scratch dirs are independent; a manifest format would just
          // keep referencing the original file)
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(f), java.nio.file.Paths.get(dst, name))
        }
      }
      java.nio.file.Files.createFile(marker)
    }
    val remaining = spark.read.option("recursiveFileLookup", "true").parquet(dst)
    remaining
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("event_type")
  }
}
