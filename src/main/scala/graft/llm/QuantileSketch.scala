package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.PolyHashing
import org.apache.spark.unsafe.types.UTF8String

/** X-QUANTILE-SKETCH: MERGEABLE quantile estimation via the dyadic
  * Count-Min structure (Cormode & Muthukrishnan's range-query reduction)
  * — the rung the sketch family was missing: X-HH/X-CMS answer point
  * frequency, X-KMV/X-HLL distincts, X-BLOOM membership; none answers
  * "what is the p99?" on mergeable bounded state. The exact operators
  * (X-QUANTILES, X-EQUIDEPTH) need a shuffle over the value domain per
  * query window; a 100 TB / streaming pipeline instead keeps ONE sketch
  * per shard/day and MERGES them (the structure is linear: counter
  * sums), then serves any quantile from the merged artifact without
  * touching data again.
  *
  * Structure: for each level l ∈ [0, [[QsLevels]]), bucket value
  * `cents div 2^l` and count into a per-level Count-Min row-set
  * ([[QsBases]] hash rows × [[QsWidth]] cells — the X-CMS kernel's
  * poly-hash discipline on the string key "level:bucket", so the DuckDB
  * oracle reproduces every cell exactly). State = L·4·W counters,
  * independent of data size. A rank query walks the dyadic tree from
  * the root: at each step the left child's estimated count (CMS point
  * query = min over rows) decides left/right and adjusts the residual
  * rank — L point queries per quantile, expected rank error
  * O(L·N/W) ≈ 0.8% of N at the chosen design point (spec bound 5%).
  *
  * Scale shape: the build is one narrow 17-way explode + TWO partial
  * +final aggs keyed by (level, bucket) then (level, row, cell) — the
  * exchange carries dyadic node keys, never values. Serving collects
  * the SKETCH (≤ L·4·W counters, bounded and data-independent — the
  * same loud-gate class as PCA's 64×64 Gram collect) and walks it
  * driver-side, exactly how a serving system probes a persisted sketch
  * artifact. The descent is pure integer arithmetic, mirrored step for
  * step by the oracle's unrolled CTE chain.
  */
object QuantileSketch {

  /** Dyadic levels: the cents domain must fit in 2^QsLevels (purchase
    * cents max ≈ 48k at sf0.1; 2^17 = 131072 leaves headroom, and the
    * build fails LOUDLY if the domain outgrows it).
    */
  val QsLevels = 17

  /** Count-Min width per level — with 17 levels the expected descent
    * rank error is ≈ L/W ≈ 0.8% of N.
    */
  val QsWidth = 2048L

  /** The X-CMS kernel's pairwise-independent poly-hash bases (4 rows). */
  val QsBases: Array[Long] = graft.functions.CountMin.Bases

  /** Served percentiles. */
  val QsPcts: Seq[Long] = Seq(10L, 25L, 50L, 75L, 90L, 99L)

  /** Exact purchase cents (the mannWhitney cast chain — exact on both
    * engines for the fixture's 2-decimal values).
    */
  private[graft] def centsOf(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select((col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))

  /** CMS cell hash of node (level, bucket) for hash row `r` — the same
    * "level:bucket" string keying the SQL mirror reproduces.
    */
  private[graft] def cellOf(level: Int, bucket: Long, r: Int): Long =
    PolyHashing.polyHash(
      UTF8String.fromString(s"$level:$bucket"), QsBases(r)) % QsWidth

  /** The sketch as a (level, r, cell, cnt) frame — per-level exact node
    * counts folded into CMS cells (collision sums, exactly what the
    * kernel would hold).
    */
  private[graft] def cellsOf(cents: DataFrame): DataFrame = {
    val nodeCols = (0 until QsLevels).map { l =>
      struct(lit(l.toLong).as("level"), expr(s"cents div ${1L << l}").as("bucket"))
    }
    val nodes = cents
      .select(explode(array(nodeCols: _*)).as("kb"))
      .select(col("kb.level").as("level"), col("kb.bucket").as("bucket"))
      .groupBy("level", "bucket").agg(count(lit(1)).as("cnt"))
    QsBases.indices.map { r =>
      nodes.select(col("level"), lit(r.toLong).as("r"),
        pmod(graft.functions.PolyHash.poly_hash(
          concat_ws(":", col("level"), col("bucket")), QsBases(r)),
          lit(QsWidth)).as("cell"),
        col("cnt"))
    }.reduce(_ unionByName _)
      .groupBy("level", "r", "cell").agg(sum("cnt").as("cnt"))
  }

  /** Serve [[QsPcts]] from the sketch: collect the bounded counter set,
    * walk the dyadic tree per percentile. Output one row per percentile:
    * (p_pct, target_rank, est_cents, n_values).
    */
  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cents = centsOf(spark, sfDir)
    val Array(maxC, n) = cents.agg(max("cents"), count(lit(1))).head() match {
      case row => Array(row.getLong(0), row.getLong(1))
    }
    require(maxC < (1L << QsLevels),
      s"cents domain $maxC exceeds 2^$QsLevels — raise QsLevels")
    // the collected artifact is ≤ QsLevels·4·QsWidth counters (data-size
    // independent); this collect IS the serving read of the sketch
    val sk: Map[(Long, Long, Long), Long] = cellsOf(cents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    def est(level: Int, bucket: Long): Long =
      QsBases.indices.map(r =>
        sk.getOrElse((level.toLong, r.toLong, cellOf(level, bucket, r)), 0L)).min
    val rows = QsPcts.map { p =>
      val target = 1L + (p * (n - 1L)) / 100L
      var t = target
      var b = 0L
      var l = QsLevels
      while (l > 0) {
        val cl = est(l - 1, 2L * b)
        if (t <= cl) b = 2L * b
        else { t -= cl; b = 2L * b + 1L }
        l -= 1
      }
      (p, target, b, n)
    }
    rows.toDF("p_pct", "target_rank", "est_cents", "n_values")
      .orderBy("p_pct")
  }
}
