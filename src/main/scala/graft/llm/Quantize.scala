package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X-EMBED-QUANT: per-dimension affine int8 quantization of the embedding
  * corpus — the storage operator of a large embedding store (4× smaller
  * than float32 before any codec; scalar quantization is the first rung
  * every production ANN index climbs before PQ). Two passes:
  *
  *  1. per-dimension min/max over the corpus — one posexplode +
  *     partial+final hash agg keyed (dim); the 64-row result collapses
  *     into ONE broadcast row (the "calibration" model, same shape as
  *     IVF's centroid broadcast).
  *  2. map-only quantize: `q_d = floor((x_d − mn_d) / (mx_d − mn_d) ·
  *     255 + 0.5)` — floor(·+0.5) instead of round() because floor is
  *     unambiguous on both engines, and every step is the same
  *     left-to-right IEEE chain in the DuckDB mirror.
  *
  * The checked profile is per label: integer-exact quantized sums and
  * positional checksums (each derived by a ROW-LOCAL fold in index
  * order, then summed — BIGINT addition is order-independent, so the
  * shuffle order can't drift the hash), the count of saturated cells
  * (q ∈ {0, 255} — the clipping health metric), and the worst per-label
  * reconstruction error (max is order-independent for doubles; the
  * quality half of the quantization contract, exactly like ANN's
  * recall_hits column). At 100 TB both passes are one shuffle of
  * 64 partials per partition + a map — never raw-vector exchanges.
  */
object Quantize {

  private val Levels = 255

  /** (mn_d, mx_d) calibration arrays collapsed into one broadcast row. */
  private def calibration(e: DataFrame): DataFrame =
    e.select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mn")))), s => s("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("dim"), col("mx")))), s => s("mx")).as("mxs"))

  /** q_d for element x at 0-based index d (LONG; degenerate dims pin 0). */
  private def qOf(x: Column, d: Column): Column = {
    val mn = element_at(col("mns"), (d + 1).cast("int"))
    val mx = element_at(col("mxs"), (d + 1).cast("int"))
    when(mx === mn, lit(0L))
      .otherwise(floor((x.cast("double") - mn) / (mx - mn) * Levels + lit(0.5)))
  }

  /** x̂_d: dequantized value of q at 0-based index d. */
  private def deqOf(q: Column, d: Column): Column = {
    val mn = element_at(col("mns"), (d + 1).cast("int"))
    val mx = element_at(col("mxs"), (d + 1).cast("int"))
    q.cast("double") / Levels * (mx - mn) + mn
  }

  def embedQuant(spark: SparkSession, sfDir: String): DataFrame =
    embedQuantOf(Tables.embeddings(spark, sfDir).select(col("label"), col("embedding")))

  /** The operator over any (label, embedding: array<float/double>) input —
    * the property-law entry point.
    */
  def embedQuantOf(e: DataFrame): DataFrame = {
    val perVec = e.join(broadcast(calibration(e)))
      .select(col("label"),
        transform(col("embedding"), (x, d) => qOf(x, d)).as("q"),
        transform(col("embedding"), (x, d) => abs(deqOf(qOf(x, d), d) - x.cast("double"))).as("err"))
      .select(col("label"),
        aggregate(col("q"), lit(0L), _ + _).as("q_sum"),
        // size-driven positions: a non-64-dim input must weight every
        // element, not null-pad the zip (which would NULL the whole fold)
        aggregate(zip_with(col("q"),
          sequence(lit(1L), size(col("q")).cast("long")), _ * _), lit(0L), _ + _).as("q_pos"),
        size(filter(col("q"), q => q === 0L || q === lit(Levels.toLong))).cast("long").as("n_sat"),
        array_max(col("err")).as("max_err"))
    perVec.groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum("q_sum").as("sum_q"),
        sum("q_pos").as("sum_qpos"),
        sum("n_sat").as("n_saturated"),
        round(max("max_err"), 6).as("worst_err"))
      .orderBy("label")
  }

  // ---- Johnson–Lindenstrauss random projection (X-RANDPROJ) -------------

  /** Projected dimensionality: 64 → 16 (4× smaller vectors, the same
    * compression class as int8 quantization but along the OTHER axis —
    * fewer dimensions instead of narrower cells; the two compose).
    */
  val ProjDims = 16

  /** Deterministic ±1 projection matrix (seeded), [[ProjDims]]×64 — the
    * dense Rademacher JL transform (Achlioptas 2003: ±1 entries satisfy
    * the JL lemma with the same guarantees as Gaussians and integer
    * arithmetic). Inlined into the oracle SQL as a flat literal, exactly
    * like the LSH hyperplane signs.
    */
  val projSigns: Array[Long] = {
    val r = new java.util.Random(11)
    Array.fill(ProjDims * 64)(if (r.nextBoolean()) 1L else -1L)
  }

  /** X-RANDPROJ: Johnson–Lindenstrauss random projection of the embedding
    * corpus — the dimensionality-reduction rung that runs BEFORE an ANN
    * index or a dedup pass when 64 dims of float are 4× more than the
    * distance computation needs: the JL lemma bounds the squared-norm
    * distortion of a ±1 projection to (1±ε) w.h.p., and this operator
    * both APPLIES the projection and REPORTS the realized distortion so
    * a run can verify the bound held on its corpus instead of trusting
    * the lemma.
    *
    * Everything is exact integers: components quantize `floor(x·1024)`
    * (the X-KMEANS convention), each projected coordinate is the
    * row-local Rademacher fold p_j = Σ_d s_{jd}·q_d, and the per-vector
    * distortion is `(Σ_j p_j²)·10^6 div (k·Σ_d q_d²)` — the ratio the JL
    * lemma pins near 10^6 ppm (E[p_j²] = Σq_d² for ±1 signs, so the
    * k-fold sum divides by k·‖q‖²). Per label the report carries the
    * count, the exact ppm sum/min/max (avg = sum div n, one integral
    * division), and a positional projection checksum that pins every
    * coordinate of every projected vector on both engines.
    *
    * Scale shape: the projection is MAP-ONLY (a 16×64 literal fold per
    * row — no calibration pass, no broadcast, nothing data-dependent:
    * the defining operational advantage of JL over PCA), and the report
    * is one partial+final agg keyed on label. Zero-norm vectors are
    * excluded on both engines (distortion undefined).
    */
  def randProj(spark: SparkSession, sfDir: String): DataFrame =
    randProjOf(Tables.embeddings(spark, sfDir).select(col("label"), col("embedding")))

  def randProjOf(e: DataFrame): DataFrame = {
    val q = transform(col("embedding"), x => floor(x.cast("double") * 1024).cast("long"))
    val proj = transform(sequence(lit(0), lit(ProjDims - 1)), j =>
      aggregate(
        zip_with(col("q"),
          slice(typedlit(projSigns.toSeq), j * 64 + 1, lit(64)), _ * _),
        lit(0L), _ + _))
    val perVec = e
      .select(col("label"), q.as("q"))
      .select(col("label"), col("q"),
        aggregate(transform(col("q"), x => x * x), lit(0L), _ + _).as("qsq"))
      .filter(col("qsq") > 0L)
      .select(col("label"), col("qsq"), proj.as("p"))
      .select(col("label"), col("qsq"),
        aggregate(transform(col("p"), x => x * x), lit(0L), _ + _).as("psq"),
        aggregate(zip_with(col("p"),
          sequence(lit(1L), lit(ProjDims.toLong)), _ * _), lit(0L), _ + _).as("p_pos"))
      .select(col("label"),
        expr(s"psq * 1000000 div ($ProjDims * qsq)").as("ppm"),
        col("p_pos"))
    perVec.groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        expr("sum(ppm) div count(1)").as("avg_ppm"),
        min("ppm").as("min_ppm"),
        max("ppm").as("max_ppm"),
        sum("p_pos").as("proj_checksum"))
      .orderBy("label")
  }
}
