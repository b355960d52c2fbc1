package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operators over the near-duplicate pair graph (SURVEY.md §2.7
  * dedup family): pairwise near-dup detection (x_dedup_minhash) finds
  * EDGES, but deduplication acts on CLUSTERS — transitively-closed
  * near-dup groups with one canonical survivor each. A pairwise "drop
  * id_b" policy (dedupPipeline) over-drops chains (a~b, b~c drops both b
  * and c even though a~c may be false); the cluster view keeps exactly
  * one doc per connected component.
  */
object Graph {

  /** Iterative minimum-label propagation: every node starts labeled with
    * its own id; each round every node takes the min label in its
    * neighborhood (including itself); fixpoint = connected components.
    *
    * Scale shape: each round is one shuffle of (id, label) pairs on node
    * id — never edges×edges — and the round count is the graph DIAMETER,
    * not the node count. Near-dup clusters are shallow (pairs, triangles,
    * short chains), so this converges in 2-3 rounds; for adversarial
    * long-chain graphs the classic fix is large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) which squares the diameter away with the same join shape.
    * Convergence is detected by the sum of labels (strictly decreasing
    * while any label still shrinks; stable exactly at the fixpoint), so
    * each round costs one count-style action on a cached frame.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // undirected: propagate along both directions of every edge
    val und = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .cache()
    var sum = labels.agg(org.apache.spark.sql.functions.sum("comp")).head().getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      val prop = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.select("id", "comp").union(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .cache()
      val nextSum = next.agg(org.apache.spark.sql.functions.sum("comp")).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSum == sum
      sum = nextSum
      rounds += 1
    }
    und.unpersist()
    labels
  }

  /** X-CONNECTED: near-dup cluster extraction — MinHash-banded candidate
    * pairs at the near-dup threshold become edges; connected components
    * give the dedup clusters. Output is one row per cluster: the
    * canonical (minimum) doc id, the cluster size, and the member-id sum
    * as a membership checksum so the oracle's hash-compare pins WHICH
    * docs each cluster holds, not just how many. The oracle re-derives
    * the same edge set in SQL (OracleLlm CTEs) and closes it with a
    * recursive transitive-closure CTE — safe at oracle scale; the
    * label-propagation plan is the one that scales.
    */
  def components(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Dedup.minhashPairs(spark, sfDir)
      .filter(col("est_jaccard") >= Dedup.NearDupThreshold)
      .select("id_a", "id_b")
    connectedComponents(edges)
      .groupBy("comp")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("id").as("sum_ids"))
      .select(col("comp").as("comp_id"), col("n_docs"), col("sum_ids"))
      .orderBy("comp_id")
  }
}
