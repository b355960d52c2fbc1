package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X-SIM (SURVEY.md §2.7): similarity search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Two paths:
  *  - [[bruteTopK]] — exact cosine top-k: broadcast the (small) query set
  *    against the full corpus. The corpus side streams — no shuffle until
  *    the per-query top-k. This is the correctness baseline and is
  *    oracle-checked (same left-to-right double arithmetic in DuckDB SQL).
  *  - [[lshTopK]] — the scale path: 16 random-hyperplane sign bits bucket
  *    the corpus; candidates are same-bucket only, so work is
  *    O(n × bucket) not O(n²). Recall measured against brute force in
  *    ScalaTest.
  *
  * All vector math is built-in higher-order functions (`zip_with` +
  * `aggregate` — codegen'd), no UDFs.
  */
object Similarity {

  /** Every `QueryStride`-th vector is a query — scales the query set with
    * the corpus (3 at sf0.001 → 250 at sf0.1).
    */
  val QueryStride = 200
  val K = 10

  /** Rank-k selection per query via the custom TopKPerKey operator
    * (graft.plans): bounded partial heaps instead of a full window sort —
    * at scale the shuffle carries K rows per query per partition, not
    * every scored pair. Identical semantics (and oracle) to
    * row_number() <= K with the same total order.
    */
  private def topK(scored: DataFrame): DataFrame =
    graft.plans.TopKPerKey(scored,
        keys = Seq("qid"), order = Seq(("cosine", true), ("cid", false)), k = K)
      .select(col("qid"), col("rank"), col("cid"), round(col("cosine"), 6).as("cosine"))
      .orderBy("qid", "rank")

  /** dot(a, b) in double precision, summed left-to-right (index order) —
    * exactly reproducible as `list_sum(list_transform(...))` in DuckDB.
    * Native kernel ([[graft.functions.DotProduct]]): same fold order as
    * the higher-order-function form, none of its per-row allocations.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def corpus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)

  /** Exact brute-force cosine top-k per query. */
  def bruteTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val c = corpus(spark, sfDir)
    val queries = c.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"))
    val scored = c.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(
        col("qid"), col("vec_id").as("cid"),
        (dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("cosine"))
    topK(scored)
  }

  // ---- LSH (random hyperplane) path ----------------------------------

  val NumTables = 4
  val BitsPerTable = 6

  /** Deterministic ±1 hyperplanes (seeded LCG), dim 64 — one group of
    * [[BitsPerTable]] planes per hash table. Multiple independent tables
    * are the standard recall lever for sign-random-projection LSH: a
    * near-neighbor only needs to collide in *one* table.
    */
  private val planes: Array[Array[Array[Float]]] = {
    val r = new java.util.Random(7)
    Array.fill(NumTables, BitsPerTable)(
      Array.fill(64)(if (r.nextBoolean()) 1.0f else -1.0f))
  }

  /** Sign-bit bucket of a vector in table `t`: bit j = (v·plane_tj) >= 0. */
  def bucketOf(v: Column, t: Int): Column =
    planes(t).zipWithIndex.map { case (p, j) =>
      when(dot(v, typedlit(p.toSeq)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (table, bucket) keys of a vector, one per hash table. */
  def bucketKeys(v: Column): Column =
    array((0 until NumTables).map(t =>
      struct(lit(t).as("t"), bucketOf(v, t).as("bucket"))): _*)

  // ---- IVF (inverted-file) path ---------------------------------------

  val CentroidStride = 100
  val NumProbes = 2

  /** IVF ANN: a deterministic "training sample" of the corpus acts as the
    * centroid set (every [[CentroidStride]]-th vector); vectors are
    * assigned to their max-cosine centroid (the inverted file), and a
    * query probes its [[NumProbes]] nearest cells only. At 100 TB the
    * corpus is written bucketed by cell id, so a probe is a partition
    * read, not a scan; the centroid table is the broadcast side.
    */
  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val c = corpus(spark, sfDir)
    val cents = c.filter(col("vec_id") % CentroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"), col("nrm").as("cn"))

    def assign(df: DataFrame, idCol: String, vCol: String, nCol: String, keep: Int) = {
      val w = Window.partitionBy(idCol)
        .orderBy(desc("cscore"), asc("cent_id"))
      df.join(broadcast(cents), lit(true))
        .select(col(idCol), col("cent_id"),
          (dot(col(vCol), col("cv")) / (col(nCol) * col("cn"))).as("cscore"))
        .withColumn("cr", row_number().over(w))
        .filter(col("cr") <= keep)
        .select(col(idCol), col("cent_id"))
    }

    val cells = assign(c.select(col("vec_id"), col("embedding"), col("nrm")),
      "vec_id", "embedding", "nrm", keep = 1)
    val queries = c.filter(col("vec_id") % QueryStride === 0)
    val probes = assign(
      queries.select(col("vec_id").as("qid"), col("embedding"), col("nrm")),
      "qid", "embedding", "nrm", keep = NumProbes)

    val cand = probes.join(cells, Seq("cent_id"))
      .select(col("qid"), col("vec_id").as("cid"))
      .filter(col("qid") =!= col("cid"))
      .distinct()
    val scored = cand
      .join(broadcast(queries.select(col("vec_id").as("qid"),
        col("embedding").as("qv"), col("nrm").as("qn"))), Seq("qid"))
      .join(corpus(spark, sfDir).select(col("vec_id").as("cid"),
        col("embedding").as("cvv"), col("nrm").as("cnn")), Seq("cid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cvv")) / (col("qn") * col("cnn"))).as("cosine"))
    topK(scored)
  }

  /** ANN top-k: exact cosine, but only over same-bucket candidates from
    * any of the [[NumTables]] hash tables. At 100 TB the corpus is
    * hash-partitioned by (table, bucket); each query probes NumTables
    * buckets instead of scanning the corpus.
    */
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val c = corpus(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(bucketKeys(col("embedding"))).as("bk"))
    val queries = corpus(spark, sfDir)
      .filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("nrm").as("qn"), explode(bucketKeys(col("embedding"))).as("qbk"))
    val scored = c.join(broadcast(queries),
        col("bk") === col("qbk") && col("vec_id") =!= col("qid"))
      .select(
        col("qid"), col("vec_id").as("cid"),
        (dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("cosine"))
      .distinct() // a pair colliding in several tables scores identically
    topK(scored)
  }
}
