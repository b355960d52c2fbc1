package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.etl.Sink
import graft.llm.Similarity

/** X-SIM-PQ-SERVE: the IVF-PQ index served through the engine's DSv2
  * catalog — plain SQL probes the PERSISTED index, the way a
  * SQL-only consumer uses an ANN store (VERDICT r12 task 6).
  *
  * Build once (marker-gated): [[Similarity.pqIndexFrame]] persists the
  * encoded corpus (vec_id, cell id, 8 codeword ids — ≈9 ints per
  * vector) as a cell-partitioned JSONL layout, [[Similarity.pqBooksFrame]]
  * the dim-sized codebook; `CREATE TABLE <cat>.ann.pq_index ...
  * PARTITIONED BY (cent_id) LOCATION ...` registers both with the
  * connector catalog ([[graft.sources.AnnIndexTable]]).
  *
  * Serve per query set, ALL in one `spark.sql`: coarse-probe the
  * [[Similarity.NumProbes]] nearest cells per query (dim-sized centroid
  * work), join the probes against the catalog index ON the cell id —
  * the scan's runtime filtering prunes to the probed cells'
  * directories, never the corpus — reconstruct candidates from the
  * broadcast codebook (8 codebook joins, one per subspace), ADC-score,
  * and keep the top-[[Similarity.PqRerank]] per query. The output is
  * the ranked ADC shortlist (qid, rank, cid): hash-equal to the
  * shortlist inside x_sim_ivfpq's oracle chain, proving the SQL face
  * and the DataFrame face serve the same index.
  *
  * Every float fold is written in index order (`aggregate`/`zip_with`
  * left folds ≡ DuckDB `list_sum(list_transform(...))`), the proven
  * x_sim_* exactness convention.
  */
object AnnServe {

  /** Stage the index + codebook and register the `ann` catalog tables;
    * returns the catalog name. Same marker/registration discipline as
    * q_dsv2_sql's `ensureFbSqlTable` (per-sfDir catalog name — Spark
    * caches catalog instances by name, so a shared name would pin the
    * first warehouse).
    */
  private[graft] def ensureAnnTables(spark: SparkSession, sfDir: String): String = {
    val wh = Sink.scratchPath(sfDir, "ann_warehouse")
    val cat = "annidx_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.FbInsightsCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val marker = Paths.get(wh, "_GRAFT_DONE_ann_pq_v1")
    if (!Files.exists(marker)) {
      Files.createDirectories(Paths.get(wh))
      spark.sql(s"DROP TABLE IF EXISTS $cat.ann.pq_index")
      spark.sql(s"DROP TABLE IF EXISTS $cat.ann.pq_books")
      val idxDir = s"$wh/staging/pq_index"
      val booksDir = s"$wh/staging/pq_books"
      Sink.dropUncommitted(idxDir)
      Sink.dropUncommitted(booksDir)
      val emb = Tables.embeddings(spark, sfDir)
      Similarity.pqIndexFrame(emb)
        .write.mode("overwrite").partitionBy("cent_id").json(idxDir)
      Similarity.pqBooksFrame(emb).write.mode("overwrite").json(booksDir)
      spark.sql(
        s"""CREATE TABLE $cat.ann.pq_index
           |  (vec_id BIGINT, cent_id BIGINT, codes ARRAY<BIGINT>)
           |USING annindex PARTITIONED BY (cent_id)
           |LOCATION '$idxDir'""".stripMargin)
      spark.sql(
        s"""CREATE TABLE $cat.ann.pq_books (bid BIGINT, bv ARRAY<DOUBLE>)
           |USING annindex LOCATION '$booksDir'""".stripMargin)
      Files.createFile(marker)
    }
    cat
  }

  /** The SQL-served ADC probe (see object doc). */
  def pqServe(spark: SparkSession, sfDir: String): DataFrame = {
    val cat = ensureAnnTables(spark, sfDir)
    val sd = Similarity.PqSubDim
    val bookJoins = (0 until Similarity.PqSubspaces).map(m =>
      s"JOIN $cat.ann.pq_books b$m ON b$m.bid = cand.codes[$m]").mkString("\n")
    val slices = (0 until Similarity.PqSubspaces).map(m =>
      s"slice(b$m.bv, ${m * sd + 1}, $sd)").mkString(", ")
    spark.sql(
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |         sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
         |           (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
         |  FROM parquet.`$sfDir/embeddings.parquet`),
         |c AS (SELECT * FROM e WHERE nrm > 0),
         |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qn FROM c
         |      WHERE vec_id % ${Similarity.QueryStride} = 0),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cv, nrm AS cn FROM c
         |          WHERE vec_id % ${Similarity.CentroidStride} = 0),
         |qs AS (
         |  SELECT q.qid, cents.cent_id,
         |         aggregate(zip_with(q.qv, cents.cv,
         |             (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         |           CAST(0 AS DOUBLE), (a, x) -> a + x) / (q.qn * cents.cn) AS cs
         |  FROM q CROSS JOIN cents),
         |probes AS (
         |  SELECT qid, cent_id FROM (
         |    SELECT qid, cent_id,
         |           row_number() OVER (PARTITION BY qid
         |             ORDER BY cs DESC, cent_id) AS rn
         |    FROM qs) WHERE rn <= ${Similarity.NumProbes}),
         |cand AS (
         |  SELECT p.qid, i.vec_id, i.cent_id, i.codes
         |  FROM probes p JOIN $cat.ann.pq_index i ON i.cent_id = p.cent_id
         |  WHERE i.vec_id <> p.qid),
         |rec AS (
         |  SELECT cand.qid, cand.vec_id,
         |         zip_with(ct.cv, concat($slices),
         |           (a, b) -> CAST(a AS DOUBLE) + b) AS av
         |  FROM cand
         |  JOIN cents ct ON ct.cent_id = cand.cent_id
         |  $bookJoins),
         |rn2 AS (
         |  SELECT qid, vec_id, av,
         |         sqrt(aggregate(av, CAST(0 AS DOUBLE), (a, x) -> a + x * x)) AS an
         |  FROM rec),
         |sa0 AS (
         |  SELECT r.qid, r.vec_id AS cid,
         |         aggregate(zip_with(q.qv, r.av,
         |             (x, y) -> CAST(x AS DOUBLE) * y),
         |           CAST(0 AS DOUBLE), (a, x) -> a + x) / (q.qn * r.an) AS sa
         |  FROM rn2 r JOIN q ON q.qid = r.qid)
         |SELECT qid, CAST(rn AS BIGINT) AS rank, cid FROM (
         |  SELECT qid, cid,
         |         row_number() OVER (PARTITION BY qid ORDER BY sa DESC, cid) AS rn
         |  FROM sa0) WHERE rn <= ${Similarity.PqRerank}
         |ORDER BY qid, rank""".stripMargin)
  }
}
