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

  /** Lazy lineage cuts for FIXED-round loops. `cut` truncates the plan to
    * a LogicalRDD immediately — the per-round plan stays flat, and shared
    * references (a frame consumed twice in the next round) read ONE
    * persisted copy instead of recomputing a duplicated subtree — but
    * defers every job to the single final materialization: a fixed-round
    * dim-sized loop needs no mid-loop action, so the eager per-round
    * checkpoint's job (one scheduled job per round, measured 0.1–0.3 s
    * each at fixture scale) was pure overhead. Convergence-PROBED loops
    * (connectedComponents, shortestPathsOf) keep an action per round by
    * necessity and fuse it with the materialization instead.
    * `seal` eagerly materializes the loop's result (ONE job running every
    * pending round) and then releases all intermediate rounds' blocks —
    * they are materialized garbage at that point, never still-needed
    * lineage.
    */
  private final class LazyCuts {
    private val inter =
      scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    def cut(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint(false)
      org.apache.spark.sql.graftx.ColumnBridge.checkpointRdd(out)
        .foreach(inter += _)
      out
    }
    def seal(df: DataFrame): DataFrame = {
      val out = df.localCheckpoint(true)
      inter.foreach(_.unpersist(blocking = false))
      inter.clear()
      out
    }
  }

  /** Run `body` — a dim-graph loop whose frames are ≤|V|² rows BY
    * CONSTRUCTION at any fact-table scale (V = the aggregated dim
    * entities, e.g. ≤25 nations; the 100 TB work is the one edge-build
    * aggregation, whose map side is split-driven and unaffected) — with
    * the loop execution conf: shuffle partitions pinned at the fixture
    * floor and AQE off. Each of a loop's per-round exchanges otherwise
    * costs one adaptively re-planned stage JOB (measured 20–150 ms of
    * pure scheduling over sub-KB frames) plus a session-wide task flood;
    * neither can pay off on a frame that is dim-bounded by construction,
    * at ANY scale — this is a property of the operator, not of the local
    * fixture. NOT applied to the doc-scale loops (connectedComponents,
    * shortestPathsOf), whose state grows with the corpus and keeps AQE.
    * Session confs are restored after `body`; the returned frame's lazy
    * tail (nation joins, orderBy) executes under session confs as before.
    */
  private def withDimLoopConf[T](spark: SparkSession)(body: => T): T = {
    val pins = Seq(
      "spark.sql.shuffle.partitions" -> graft.streaming.Drain.PartitionFloor.toString,
      "spark.sql.adaptive.enabled" -> "false",
      // no auto-broadcast inside the loop: each auto-chosen broadcast of a
      // round's (tiny) frame is a separately scheduled build job (~0.1 s of
      // pure scheduling), and a fixed-round loop pays it per round — the
      // 4-partition shuffle joins pipeline all rounds inside ONE sealed
      // job instead (explicit broadcast() hints are unaffected)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pins.map { case (k, _) => k -> spark.conf.getOption(k) }
    pins.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Iterative minimum-label propagation WITH pointer jumping: every node
    * starts labeled with its own id; each round every node takes the min
    * label in its neighborhood (including itself), then shortcuts through
    * its label's label (`comp := label(comp)`, the Shiloach–Vishkin
    * pointer jump). Fixpoint = connected components.
    *
    * Scale shape: each round is two shuffles of (id, label) pairs on node
    * id — never edges×edges — and the pointer jump squares the distance a
    * label travels per round, so the round count is O(log diameter), not
    * the diameter itself (a 1M-node chain converges in ~20 rounds; the
    * same bound large-star/small-star achieves, Kiveris et al., SoCC'14).
    * Convergence is detected by the sum of labels (strictly decreasing
    * while any label still shrinks; stable exactly at the fixpoint), so
    * each round costs one count-style action on a cached frame. Exiting
    * via the round cap without the fixpoint is an ERROR, never silently
    * wrong labels.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // undirected: propagate along both directions of every edge
    val und = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    // iterative plans MUST truncate lineage every round: the pointer-jump
    // self-join doubles the logical plan per iteration, so an uncut
    // lineage grows exponentially (the driver OOMs stringifying it long
    // before executors feel it). localCheckpoint materializes the round's
    // labels and restarts the plan from the stored blocks — the same
    // discipline GraphFrames applies to its iterative algorithms.
    // deterministic release of superseded checkpoint blocks: a reassigned
    // `labels` only frees its blocks when the ContextCleaner eventually
    // GCs the unreachable RDD — over tens of rounds that pins dozens of
    // full (id, comp) snapshots in executor storage. Hold the exact RDD
    // each localCheckpoint registers (via the frame's LogicalRDD) and
    // unpersist the PREVIOUS round's blocks as soon as the next round is
    // materialized — never a registry diff, which would sweep RDDs other
    // threads persist concurrently.
    und.count() // materialize the edge cache before the round loop
    // LAZY lineage cut + fused probe: localCheckpoint(eager = false)
    // truncates the plan to a LogicalRDD immediately but defers
    // materialization to the round's convergence probe — ONE action per
    // round instead of the eager checkpoint's two (materialize job +
    // probe job). The probe's agg computes over the marked RDD, which
    // persists its blocks on that first computation; only THEN is the
    // superseded round released (its blocks are materialized garbage by
    // that point, never still-needed lineage).
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    def probeSum(df: DataFrame): (DataFrame, Long) = {
      val out = df.localCheckpoint(false)
      val s = out.agg(org.apache.spark.sql.functions.sum("comp")).head().getLong(0)
      val fresh = org.apache.spark.sql.graftx.ColumnBridge.checkpointRdd(out)
      prevCkpt.foreach(_.unpersist(blocking = false))
      prevCkpt = fresh
      (out, s)
    }
    var (labels, sum) = probeSum(
      und.select(col("src").as("id")).distinct().withColumn("comp", col("id")))
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // fresh aliases on BOTH union branches: the checkpointed frame's
      // attribute ids must not appear twice in one Union (Catalyst's
      // constraint rewrite requires distinct child output ids)
      val prop = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("comp").as("comp"))
      val stepped = labels.select(col("id").as("id"), col("comp").as("comp")).union(prop)
        .groupBy("id").agg(min("comp").as("comp"))
      // pointer jump: a label is always some node's id, so re-resolving it
      // through `stepped` moves every node to its label's (smaller) label
      val (next, nextSum) = probeSum(stepped.as("a")
        .join(
          stepped.select(col("id").as("p_id"), col("comp").as("p_comp")),
          col("a.comp") === col("p_id"), "left")
        .select(
          col("a.id").as("id"),
          least(col("a.comp"), coalesce(col("p_comp"), col("a.comp"))).as("comp")))
      labels = next
      converged = nextSum == sum
      sum = nextSum
      rounds += 1
    }
    und.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxRounds rounds — " +
          "labels would be incorrect; raise maxRounds")
    labels
  }

  /** X-GRAPH-DEGREE: degree distribution of the near-dup pair graph — the
    * dedup-health profile (a fat-degree tail means boilerplate/template
    * text is gluing unrelated docs into mega-clusters; production dedup
    * pipelines gate on exactly this before accepting a clustering). One
    * groupBy per endpoint then a count-of-counts — two key-only shuffles,
    * no document payload. `min_id` pins a concrete witness per degree so
    * the oracle checks membership, not just the histogram shape.
    */
  def degrees(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Dedup.minhashPairsTable(spark, sfDir)
      .filter(col("est_jaccard") >= Dedup.NearDupThreshold)
      .select("id_a", "id_b")
    edges.select(col("id_a").as("id"))
      .union(edges.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
      .groupBy("degree")
      .agg(count(lit(1)).as("n_nodes"), min("id").as("min_id"))
      .orderBy("degree")
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
    val edges = Dedup.minhashPairsTable(spark, sfDir)
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

  // ---- Triangle census (X-TRIANGLES) ---------------------------------

  /** Degree-oriented triangle counting over an undirected canonical
    * (id_a < id_b, distinct) edge frame. Each edge is oriented from its
    * lower-(degree, id) endpoint to the higher; wedges are the self-join
    * of the oriented list on the source; a wedge (v, w) closes into a
    * triangle iff (v, w) is an edge. The orientation is THE scale move:
    * out-degrees in the oriented graph are O(√m), so the wedge join is
    * bounded by Σ outdeg² = O(m^1.5) (the node-iterator bound) instead
    * of the hub-degree² blowup a naive neighbor self-join hits on skewed
    * graphs — and every triangle has exactly one wedge source, so the
    * count needs no /3 correction. Shuffles carry (id, id) pairs only.
    */
  def trianglesOf(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("id_a").as("u"))
      .union(edges.select(col("id_b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("d"))
    val ea = edges
      .join(deg.select(col("u").as("id_a"), col("d").as("da")), "id_a")
      .join(deg.select(col("u").as("id_b"), col("d").as("db")), "id_b")
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("id_a") < col("id_b"))
    // cached: the oriented list is BOTH sides of the wedge self-join —
    // uncached, the degree-join subtree under it executed twice (at scale
    // the oriented list is the materialized intermediate every triangle
    // pipeline persists before the wedge pass)
    val oriented = ea.select(
      when(fwd, col("id_a")).otherwise(col("id_b")).as("s"),
      when(fwd, col("id_b")).otherwise(col("id_a")).as("t"))
      .cache()
    // x.t < y.t keeps the wedge endpoints in id order — the canonical
    // form the edge frame itself uses, so closure is a direct equi-join
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.t").as("id_a"), col("y.t").as("id_b"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    // one pass over the wedge stream for BOTH counts: a left join against
    // the (distinct, canonical) edge set tags each wedge closed/open, so
    // the wedge self-join runs once instead of once per aggregate
    val closed = wedges
      .join(edges.withColumn("closed", lit(1L)), Seq("id_a", "id_b"), "left")
      .agg(
        count(lit(1)).as("n_wedges"),
        coalesce(sum("closed"), lit(0L)).as("n_triangles"))
    nNodes.crossJoin(nEdges).crossJoin(closed)
  }

  /** X-TRIANGLES: triangle census of the banded near-dup candidate graph
    * — the cohesion diagnostic between X-GRAPH-DEGREE (how connected) and
    * X-CONNECTED (what merges): a high triangle count means candidate
    * clusters are mutually-similar cliques (safe to collapse), a
    * wedge-heavy/triangle-poor graph means chains gluing unrelated docs
    * through a shared template. Runs on the UN-thresholded candidate
    * set — the census grades the banding itself, not the verified edges.
    */
  def triangles(spark: SparkSession, sfDir: String): DataFrame =
    trianglesOf(Dedup.minhashPairsTable(spark, sfDir).select("id_a", "id_b"))

  // ---- PageRank (X-PAGERANK) -----------------------------------------

  /** Fixed iteration count: the oracle unrolls the same number of
    * iterations as CTEs, so the two sides compute the identical partial
    * sums (PageRank is a fixpoint; a checked operator needs a determinate
    * truncation of it, exactly like kmeansIter's fixed Lloyd rounds).
    */
  val PrIterations = 3

  /** Damping as two literals (0.85 / 0.15), NOT `1 - 0.85` on one side
    * and `0.15` on the other — the two IEEE doubles differ in the last
    * ulp and the correctness gate is exact equality after round(…, 6).
    */
  val PrDamping = 0.85
  val PrRest = 0.15

  /** The nation-level trade graph: one weighted edge per (customer
    * nation → supplier nation) pair, weight = lineitem count flowing
    * between them. The SCALE work is all here — lineitem is the 100 TB
    * fact; orders/customer/supplier are broadcast dims, so the plan is
    * broadcast-join map work plus ONE partial-aggregated shuffle that
    * carries ≤ |nations|² rows. The rank iteration then runs on the
    * aggregated graph, which is tiny regardless of fact-table scale —
    * the standard two-phase shape for entity-graph analytics over logs.
    */
  def tradeEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
    val ord = graft.Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val cust = graft.Tables.load(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val supp = graft.Tables.load(spark, sfDir, "supplier").select("s_suppkey", "s_nationkey")
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank over an (src, dst, w) edge frame: r'(j) =
    * rest/N + d·(Σ_{i→j} r(i)·w_ij/outw(i) + dangling/N), with dangling
    * mass (rank on nodes with no out-edges) redistributed uniformly.
    * Each iteration is one join-aggregate over the edge frame plus a
    * one-row dangling aggregate; lineage is cut per round
    * ([[connectedComponents]]' discipline) so the plan stays flat however
    * many rounds run. Edges and out-weights are computed once and cached
    * — they are loop invariants.
    */
  def pageRankOf(edges: DataFrame, iterations: Int = PrIterations): DataFrame =
      withDimLoopConf(edges.sparkSession) {
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().cache()
    val outw = edges.groupBy("src").agg(sum("w").cast("double").as("outw"))
    // edge frame pre-joined with its out-weight: r(i)·w/outw(i) needs only
    // the current ranks joined in per round
    val ew = edges.join(outw, "src")
      .select(col("src"), col("dst"), (col("w").cast("double")).as("w"), col("outw"))
      .cache()
    ew.count() // materialize invariants BEFORE the per-round checkpoints
    val nDouble = nodes.count().toDouble
    // fixed iterations, no convergence probe → lazy cuts, ONE final job
    // (each round's ranks feed both the contribution join and the
    // dangling-mass anti-join; the cut makes both read one persisted copy)
    val cuts = new LazyCuts
    var ranks = cuts.cut(nodes.withColumn("r", lit(1.0) / lit(nDouble)))
    (1 to iterations).foreach { _ =>
      val contrib = ew.join(ranks, ew("src") === ranks("id"))
        .select(col("dst"), (col("r") * col("w") / col("outw")).as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      // dangling mass: rank sitting on nodes with no out-edges
      val dangling = ranks.join(ew.select("src").distinct(),
          ranks("id") === col("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dang"))
      ranks = cuts.cut(nodes
        .join(contrib, nodes("id") === contrib("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(PrRest) / lit(nDouble) +
            lit(PrDamping) * (coalesce(col("c"), lit(0.0)) + col("dang") / lit(nDouble)))
            .as("r")))
    }
    val out = cuts.seal(ranks)
    // the returned ranks are materialized (seal), so the loop invariants
    // can be released immediately — no JVM-lifetime pins
    ew.unpersist()
    nodes.unpersist()
    out
  } // withDimLoopConf

  /** X-PAGERANK: rank the nation trade graph. Output carries the rank
    * (round 6 — double summation order is the only engine-dependent bit)
    * plus EXACT integer in/out edge weights as integrity columns, keyed
    * by nation name.
    */
  def pageRank(spark: SparkSession, sfDir: String): DataFrame = {
    // cached: the AGGREGATED ≤|nations|² graph (a few KB however big the
    // fact table), consumed by the rank loop AND the in/out integrity
    // aggregates — the bounded loop invariant a rank computation is built
    // around, not a fixture-scale relation
    val e = tradeEdges(spark, sfDir).cache()
    val ranks = pageRankOf(e)
    val inw = e.groupBy(col("dst").as("id")).agg(sum("w").as("in_w"))
    val outTot = e.groupBy(col("src").as("id")).agg(sum("w").as("out_w"))
    val nation = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("id"), col("n_name"))
    ranks
      .join(inw, Seq("id"), "left")
      .join(outTot, Seq("id"), "left")
      .join(broadcast(nation), Seq("id"))
      .select(col("n_name"),
        coalesce(col("in_w"), lit(0L)).as("in_w"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        round(col("r"), 6).as("rank"))
      .orderBy("n_name")
  }

  // ---- Multi-source BFS (X-SHORTEST-PATH) ----------------------------

  /** Multi-source BFS over an undirected (id_a, id_b) edge frame:
    * every node matching `seed` starts at distance 0; each round relaxes
    * one hop (`dist' = min(dist, neighbor dist + 1)`) until a fixpoint.
    * Returns (id, dist) for every node REACHABLE from a seed — unreached
    * nodes are absent by contract (their distance is undefined, and
    * emitting a sentinel would make the histogram lie).
    *
    * Scale shape: each round shuffles (id, dist) pairs only — never the
    * edge payload twice — and the loop state is localCheckpoint'ed with
    * the previous round's blocks released eagerly
    * ([[connectedComponents]]' lineage/storage discipline). Round count
    * is the graph's seed-eccentricity (true BFS depth), each round one
    * join + one min-aggregate; convergence is detected by the
    * (reached-count, distance-sum) pair, which changes on every
    * productive round and is stable exactly at the fixpoint. Exiting via
    * the round cap without converging THROWS — a truncated BFS is wrong,
    * not approximate.
    */
  def shortestPathsOf(edges: DataFrame, seed: org.apache.spark.sql.Column,
      maxRounds: Int = 40): DataFrame = {
    val und = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .cache()
    und.count() // materialize the edge cache before the round loop
    // LAZY lineage cut + fused (count, sum) probe — one action per round
    // (the connectedComponents discipline: the probe materializes the
    // lazily-marked checkpoint, then the superseded round is released)
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    def probeSig(df: DataFrame): (DataFrame, (Long, Long)) = {
      val out = df.localCheckpoint(false)
      val r = out.agg(count(lit(1)), coalesce(sum("dist"), lit(0L))).head()
      val fresh = org.apache.spark.sql.graftx.ColumnBridge.checkpointRdd(out)
      prevCkpt.foreach(_.unpersist(blocking = false))
      prevCkpt = fresh
      (out, (r.getLong(0), r.getLong(1)))
    }
    val nodes = und.select(col("src").as("id")).distinct()
    var (dist, state) = probeSig(
      nodes.filter(seed).withColumn("dist", lit(0L)))
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val prop = und.join(dist, und("src") === dist("id"))
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
      val (next, nextState) = probeSig(
        dist.select(col("id").as("id"), col("dist").as("dist")).union(prop)
          .groupBy("id").agg(min("dist").as("dist")))
      dist = next
      converged = nextState == state
      state = nextState
      rounds += 1
    }
    und.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"shortestPathsOf did not converge within $maxRounds rounds — " +
          "distances would be truncated; raise maxRounds")
    dist
  }

  /** X-SHORTEST-PATH: BFS distance profile of the near-dup graph from
    * the decile seed set (graph nodes with doc_id % 10 == 0) — "how far
    * is every near-duplicate from an audited anchor document", the
    * provenance-radius question a contamination audit asks (distance 1 =
    * direct near-dup of an anchor, 2 = dup-of-a-dup, …). One row per
    * distance with a count, a witness, and a membership checksum; the
    * oracle closes the same edge set with a recursive CTE
    * ([[OracleLlm.shortestPathSql]]).
    */
  def shortestPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Dedup.minhashPairsTable(spark, sfDir)
      .filter(col("est_jaccard") >= Dedup.NearDupThreshold)
      .select("id_a", "id_b")
    shortestPathsOf(edges, col("id") % 10 === 0)
      .groupBy("dist")
      .agg(
        count(lit(1)).as("n_nodes"),
        min("id").as("min_id"),
        sum("id").as("sum_ids"))
      .orderBy("dist")
  }

  // ---- Label propagation communities (X-LABELPROP) --------------------

  /** Fixed synchronous rounds: LPA is not a fixpoint computation under
    * synchronous update (labels can 2-cycle on bipartite-ish structure),
    * so a CHECKED operator takes the standard determinate form — a fixed
    * round count unrolled identically in the oracle, like PageRank's
    * [[PrIterations]] and kmeansIter's Lloyd rounds.
    */
  val LpRounds = 4

  /** Weighted synchronous label propagation over an (src, dst, w) edge
    * frame (Raghavan et al. 2007): every node starts labeled with its own
    * id; each round every node adopts the label with the LARGEST total
    * incident edge weight among its neighbors (ties → smallest label —
    * the total order that makes the argmax exact on both engines).
    * Communities = final labels. This is the community-detection sibling
    * of [[connectedComponents]]: components ask "connected at all?",
    * LPA asks "where is the weight concentrated?" — a dense cluster
    * absorbs its boundary even when everything is one component.
    *
    * Each round is ONE join + one (node, label) weight agg + one argmax
    * window over per-node candidate labels — shuffles carry (id, label,
    * weight) triples, never edges×edges; loop state is
    * localCheckpoint'ed with eager release of the superseded round
    * ([[connectedComponents]]' discipline).
    */
  def labelPropOf(edges: DataFrame, rounds: Int = LpRounds): DataFrame =
      withDimLoopConf(edges.sparkSession) {
    import org.apache.spark.sql.expressions.Window
    val und = edges.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("w"))
      .union(edges.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .cache()
    und.count() // materialize the edge cache before the round loop
    // fixed rounds, no convergence probe → lazy cuts, ONE final job
    val cuts = new LazyCuts
    val nodes = und.select(col("src").as("id")).distinct()
    var labels = cuts.cut(nodes.withColumn("lab", col("id")))
    (1 to rounds).foreach { _ =>
      val scores = und.join(labels, und("dst") === labels("id"))
        .groupBy(und("src").as("nid"), col("lab"))
        .agg(sum("w").as("wsum"))
      val argmax = scores.withColumn("rn",
        row_number().over(Window.partitionBy("nid")
          .orderBy(col("wsum").desc, col("lab"))))
        .filter(col("rn") === 1)
        .select(col("nid").as("id"), col("lab"))
      // isolated nodes (none here, but the operator contract) keep theirs
      labels = cuts.cut(
        nodes.join(argmax, Seq("id"), "left")
          .select(col("id"), coalesce(col("lab"), col("id")).as("lab")))
    }
    val out = cuts.seal(labels)
    und.unpersist()
    out
  } // withDimLoopConf

  /** X-LABELPROP: communities of the nation trade graph — the symmetrized
    * [[tradeEdges]] weight matrix (fact-sized work is the ONE aggregated
    * edge build, as in X-PAGERANK; the propagation runs on the ≤|nations|²
    * graph). Output: nation name, final community label, and the
    * community's size — plus the community-count health column every
    * clustering run reads first.
    */
  private val lpCache = new graft.Memo

  /** Memoized (session, sfDir) label table: labelPropOf's result is an
    * eager localCheckpoint, so memoizing the frame shares the whole LPA
    * run between x_labelprop and x_modularity instead of re-running the
    * fact-sized edge build + 4 rounds per consumer.
    */
  def labelTable(spark: SparkSession, sfDir: String): DataFrame =
    lpCache.getOrBuild(spark, sfDir) {
      labelPropOf(tradeEdges(spark, sfDir))
    }

  def labelProp(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = labelTable(spark, sfDir)
    val sizes = labels.groupBy("lab").agg(count(lit(1)).as("comm_size"))
    val nation = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("id"), col("n_name"))
    labels.join(broadcast(sizes), Seq("lab"))
      .join(broadcast(nation), Seq("id"))
      .select(col("n_name"), col("lab").cast("long").as("community"),
        col("comm_size"))
      .orderBy("n_name")
  }

  // ---- k-core decomposition (X-KCORE) ---------------------------------

  /** Core order for [[kcore]] — chosen where the peel genuinely bites on
    * the fixture's thresholded graph at every SF (nodes are peeled AND a
    * non-empty core survives; k ≥ 9 empties the sf0.001 graph, k ≤ 7
    * peels nothing at sf0.01+).
    */
  val KcoreK = 8

  /** Unrolled peel rounds: BOTH engines run exactly this many — peeling
    * is monotone and idempotent at the fixpoint, so extra rounds are
    * no-ops and the fixed unroll is a determinate truncation (the
    * PrIterations convention); the spec asserts the fixture actually
    * converges inside the cap, so the output IS the k-core, not a
    * truncation artifact.
    */
  val KcoreRounds = 8

  /** X-KCORE: k-core of the thresholded nation trade graph — the maximal
    * subgraph where every node keeps ≥ k STRONG trade partners, the
    * standard "dense backbone vs periphery" split (degree says who has
    * many partners; the core says whose partners are themselves
    * well-connected). Edges are sparsified to above-mean weight by the
    * exact integer cross-multiplication w·|E| > Σw (no float mean),
    * symmetrized and dedup'd, then peeled: each round drops nodes whose
    * degree within the SURVIVING subgraph is < k, for [[KcoreRounds]]
    * unrolled rounds mirrored 1:1 as oracle CTEs. Output: each core
    * member's nation name and its in-core degree.
    *
    * Scale shape: identical two-phase split as X-PAGERANK — the 100 TB
    * fact work is the ONE aggregated edge build (broadcast dims + one
    * ≤|nations|² partial-agg shuffle); the peel loop runs on the tiny
    * aggregated graph with per-round lineage cuts.
    */
  private val undCache = new graft.Memo

  /** The ABOVE-MEAN-weight undirected simple trade graph shared by
    * [[kcore]] and [[linkPred]]: edges kept by the exact integer
    * cross-multiplication w·|E| > Σw (no float mean), self-loops
    * dropped, symmetrized and dedup'd. Memoized + cached per
    * (session, sfDir): the plan references the FACT-sized tradeEdges
    * build twice (once for the mean total, once for the filter), so an
    * uncached frame paid two lineitem joins per consumer — and both
    * kcore and linkPred consume it.
    */
  def thresholdedUndirected(spark: SparkSession, sfDir: String): DataFrame =
    undCache.getOrBuild(spark, sfDir, cache = true) {
      val e = tradeEdges(spark, sfDir)
      val tot = e.agg(sum("w").as("sw"), count(lit(1)).as("ne"))
      val strong = e.crossJoin(broadcast(tot))
        .filter(col("w") * col("ne") > col("sw") && col("src") =!= col("dst"))
        .select("src", "dst")
      strong.select(col("src").as("a"), col("dst").as("b"))
        .union(strong.select(col("dst").as("a"), col("src").as("b")))
        .distinct()
    }

  /** Core peel loop over any undirected simple (a, b) edge frame —
    * separated so the property law can drive it with generated graphs
    * against a brute sequential peel. Returns (a, core_degree) of the
    * surviving subgraph, eagerly materialized (the input cache may be
    * released by the caller afterwards).
    */
  def kcoreOf(und: DataFrame, k: Int = KcoreK, rounds: Int = KcoreRounds): DataFrame =
      withDimLoopConf(und.sparkSession) {
    und.count() // materialize the edge cache before the round loop
    // fixed rounds, no convergence probe → lazy cuts, ONE final job
    // (each round's `alive` is consumed twice by the next round's two
    // semi-joins; the cut makes both read one persisted copy)
    val cuts = new LazyCuts
    var alive = cuts.cut(und.select(col("a").as("id")).distinct())
    // b-side semi-join FIRST, a-side LAST (guide §2.4): the last join
    // leaves the frame hash-partitioned by `a`, which the degree groupBy
    // reuses — one exchange per round removed vs the a-then-b order
    (1 to rounds).foreach { _ =>
      val act = und
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
      alive = cuts.cut(
        act.groupBy("a").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .select(col("a").as("id")))
    }
    cuts.seal(und
      .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
      .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
      .groupBy("a").agg(count(lit(1)).as("core_degree")))
  } // withDimLoopConf

  def kcore(spark: SparkSession, sfDir: String): DataFrame = {
    // shared memoized cache — NOT unpersisted here; linkPred reuses it
    val und = thresholdedUndirected(spark, sfDir)
    val core = kcoreOf(und)
    val nation = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("a"), col("n_name"))
    core.join(broadcast(nation), Seq("a"))
      .select(col("n_name"), col("core_degree"))
      .orderBy("n_name")
  }

  /** Predictions reported by [[linkPred]]. */
  val LinkPredTopK = 10

  /** X-LINK-PRED: common-neighbor link prediction on the thresholded
    * trade graph — for every NON-edge (i, j), the count of shared strong
    * partners (the classic Liben-Nowell/Kleinberg baseline: two nations
    * trading heavily with the same partners but not each other are the
    * missing-edge candidates a market-expansion or anomaly review reads
    * first), plus the neighbor-set Jaccard in integer ppm. All exact:
    * common neighbors from ONE self-join of the undirected edge frame on
    * the shared endpoint, the union size by inclusion-exclusion from
    * broadcast degrees, non-adjacency by an anti-join against the edge
    * set. Report = top [[LinkPredTopK]] candidate pairs on the
    * (cn desc, id_a, id_b) total order via TakeOrderedAndProject.
    *
    * Scale shape: the two-phase entity-graph discipline again — the
    * 100 TB fact collapses to the ≤|nations|² aggregated graph in ONE
    * partial-agg shuffle, and every join here (wedge self-join, degree
    * broadcast, anti-join) runs on that dim-sized frame. On a BIG graph
    * the same plan holds with the wedge join keyed on the shared
    * endpoint — the standard triangle/wedge enumeration shuffle — and a
    * degree-ordered orientation bounding the per-node wedge fanout.
    */
  def linkPred(spark: SparkSession, sfDir: String): DataFrame = {
    // shared memoized cache — kcore's consumer too; never unpersisted
    val und = thresholdedUndirected(spark, sfDir)
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
    val wedges = und.select(col("a").as("id_a"), col("b").as("via"))
      .join(und.select(col("a").as("via2"), col("b").as("id_b")),
        col("via") === col("via2") && col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("cn"))
    val nonEdges = wedges.join(und,
        wedges("id_a") === und("a") && wedges("id_b") === und("b"), "left_anti")
    val out = nonEdges
      .join(broadcast(deg.select(col("a").as("id_a"), col("deg").as("deg_a"))), Seq("id_a"))
      .join(broadcast(deg.select(col("a").as("id_b"), col("deg").as("deg_b"))), Seq("id_b"))
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"),
        col("cn"), col("deg_a"), col("deg_b"),
        expr("cn * 1000000 div (deg_a + deg_b - cn)").as("jaccard_ppm"))
      .orderBy(col("cn").desc, col("id_a"), col("id_b"))
      .limit(LinkPredTopK)
    out
  }

  // ---- closeness centrality (X-CLOSENESS) ------------------------------

  /** Unrolled multi-source BFS rounds: the thresholded graph's diameter
    * is well under this (the spec pins max eccentricity < rounds, which
    * PROVES the fixpoint was reached — BFS relaxation is monotone and
    * idempotent once converged).
    */
  val ClosenessRounds = 6

  /** X-CLOSENESS: closeness centrality + eccentricity per nation on the
    * thresholded trade graph — "how few hops to everyone" (X-PAGERANK
    * reads incoming importance, X-KCORE density membership; closeness
    * reads REACH — the logistics/latency notion of centrality). One
    * simultaneous multi-source BFS instead of |V| sequential ones: the
    * state is the (src, id, dist) relaxation frame for ALL sources at
    * once (≤|V|² rows — dim-sized, because the fact collapsed to the
    * aggregated graph first), rounds unrolled identically as oracle
    * CTEs. The relaxation is FRONTIER-BASED (the [[shortestPathsOf]]
    * discipline): with unit weights a node's distance is final the
    * first round it appears, so each round joins only the rows
    * DISCOVERED last round against the graph, min-aggs that
    * frontier-sized delta, anti-joins the settled set, and appends —
    * never re-aggregating the full (src, id) frame per round (the
    * re-agg version's per-round cost grew with the settled set; this
    * one's is ∝ the frontier, which empties at the diameter). Output
    * per nation: reached count, distance sum, eccentricity (max dist),
    * and closeness in integer ppm ((n_reached−1)·10^6 div Σd — the
    * Bavelas definition on the reachable set, so disconnected
    * components don't zero it).
    */
  /** Frontier multi-source BFS over a symmetric (a, b) edge frame: every
    * node is its own source, and the returned (src, id, d) frame holds
    * the exact hop distance for every pair reachable within `rounds`
    * (pairs farther than `rounds` are absent — callers pin diameter <
    * rounds, which the closeness spec proves on the fixture and the
    * property law proves against a sequential reference). Exposed for
    * that law.
    */
  private[graft] def multiSourceBfs(
      und: DataFrame, rounds: Int = ClosenessRounds): DataFrame =
      withDimLoopConf(und.sparkSession) {
    // fixed rounds, no convergence probe → lazy cuts, ONE final job.
    // Each round keeps two frames alive (settled dist + last frontier),
    // both cut: dist is consumed by the anti-join AND the union, the
    // frontier by the next relax — the cuts make every reference read
    // one persisted copy inside the single sealing job.
    val cuts = new LazyCuts
    val seed = cuts.cut(und.select(col("a")).distinct()
      .select(col("a").as("src"), col("a").as("id"), lit(0L).as("d")))
    var dist = seed
    var frontier = seed
    (1 to rounds).foreach { _ =>
      val relax = frontier.join(und, frontier("id") === und("a"))
        .select(col("src"), col("b").as("id"), (col("d") + 1L).as("d"))
      // min-agg the frontier-sized delta, keep only first discoveries
      val discovered = cuts.cut(relax.groupBy("src", "id").agg(min("d").as("d"))
        .join(dist, Seq("src", "id"), "left_anti"))
      val next = cuts.cut(dist.union(discovered))
      dist = next
      frontier = discovered
    }
    // seal: one job materializes every round, then every intermediate
    // (including the final frontier, which has no further consumer) is
    // released — only the returned dist pins storage memory
    cuts.seal(dist)
  } // withDimLoopConf

  private val bfsCache = new graft.Memo

  /** Memoized settled multi-source BFS distances of the thresholded
    * trade graph — x_closeness and x_betweenness consume the IDENTICAL
    * (src, id, d) frame, so the BFS runs once per (session, sfDir) and
    * both read the materialized result (the [[labelTable]] convention:
    * a structural intermediate shared across queries, recomputed from
    * the parquet inputs in every fresh session).
    */
  private[graft] def bfsDistTable(spark: SparkSession, sfDir: String): DataFrame =
    bfsCache.getOrBuild(spark, sfDir) {
      multiSourceBfs(thresholdedUndirected(spark, sfDir))
    }

  def closeness(spark: SparkSession, sfDir: String): DataFrame = {
    val dist = bfsDistTable(spark, sfDir)
    val nation = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("src"), col("n_name"))
    dist.groupBy("src")
      .agg(count(lit(1)).as("n_reached"), sum("d").as("sum_dist"),
        max("d").as("eccentricity"))
      .join(broadcast(nation), Seq("src"))
      .select(col("n_name"), col("n_reached"), col("sum_dist"), col("eccentricity"),
        expr("(n_reached - 1) * 1000000 div nullif(sum_dist, 0)").as("closeness_ppm"))
      .orderBy("n_name")
  }

  // ---- shortest-path centrality (X-BETWEENNESS) ------------------------

  /** X-BETWEENNESS: exact stress centrality — the shortest-path
    * betweenness family's integer member: for every node v, the number
    * of shortest (s, t) paths that pass THROUGH v, over all unordered
    * reachable pairs (σ_sv·σ_vt summed where d(s,v) + d(v,t) = d(s,t)).
    * This is the "who brokers the traffic" question X-CLOSENESS (how
    * near) and X-PAGERANK (how endorsed) don't answer; the classic
    * fractional betweenness divides each pair's contribution by σ_st —
    * a float chain whose summation order no engine pins — while the
    * stress form is EXACT integers end to end, so the whole table
    * hash-checks.
    *
    * Computation: the settled multi-source BFS distances
    * ([[multiSourceBfs]] — the x_closeness machinery, frontier rounds
    * with lineage cuts) plus per-level path counts σ over the BFS DAG:
    * level ℓ's σ(v) = Σ of σ(u) over level-(ℓ−1) BFS predecessors —
    * [[ClosenessRounds]] unrolled dim-sized joins, exact integer sums.
    * The through-count is then one self-join of the (src, id, d, σ)
    * table on the interior node with the pair-distance row filtering
    * da + db = d(s,t). Everything runs on the nation-aggregated graph:
    * the fact collapses ONCE (memoized edge build shared with every
    * graph operator), all centrality math is ≤ |V|²-row arithmetic.
    * Per-pair conservation (Σ_v contributions = σ_st·(d_st − 1)) is the
    * spec's closed-form law.
    */
  def betweenness(spark: SparkSession, sfDir: String): DataFrame = {
    val und = thresholdedUndirected(spark, sfDir)
    val dist = bfsDistTable(spark, sfDir)
    // fixed-round σ loop: the same LazyCuts discipline as multiSourceBfs —
    // without cuts, `all = all.unionAll(next)` plus the re-joined `sig`
    // unrolled the plan past 2600 Exchange mentions (the committed r15
    // dump), all optimizer/compile cost. Each round cuts `next` (consumed
    // by the union AND the next relax) and the growing `all`; `seal` on
    // the joined (src,id,d,σ) table materializes ONE job, releases every
    // intermediate round, and its three downstream readers (a, b, st)
    // read one persisted copy instead of tripling the subtree.
    val ds = withDimLoopConf(spark) {
      val cuts = new LazyCuts
      var sig = cuts.cut(dist.filter(col("d") === 0L)
        .select(col("src"), col("id"), lit(1L).as("sigma")))
      var all = sig
      (1 to ClosenessRounds).foreach { i =>
        val next = cuts.cut(sig.join(und, sig("id") === und("a"))
          .select(col("src"), col("b").as("id"), col("sigma"))
          .join(dist.filter(col("d") === i.toLong).select("src", "id"),
            Seq("src", "id"), "left_semi")
          .groupBy("src", "id").agg(sum("sigma").as("sigma")))
        all = cuts.cut(all.unionAll(next))
        sig = next
      }
      cuts.seal(dist.join(all, Seq("src", "id")))
    }
    val a = ds.filter(col("d") > 0)
      .select(col("src").as("s"), col("id").as("v"), col("d").as("da"),
        col("sigma").as("sa"))
    val b = ds.filter(col("d") > 0)
      .select(col("src").as("t"), col("id").as("v"), col("d").as("db"),
        col("sigma").as("sb"))
    val st = ds.filter(col("src") < col("id"))
      .select(col("src").as("s"), col("id").as("t"), col("d").as("d_st"))
    val through = a.join(b, Seq("v"))
      .filter(col("s") < col("t"))
      .join(st, Seq("s", "t"))
      .filter(col("da") + col("db") === col("d_st"))
      .groupBy("v")
      .agg(sum(col("sa") * col("sb")).as("stress"),
        count(lit(1)).as("n_pairs_on"))
    val nation = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("v"), col("n_name"))
    und.select(col("a").as("v")).distinct()
      .join(through, Seq("v"), "left")
      .join(broadcast(nation), Seq("v"))
      .select(col("n_name"),
        coalesce(col("stress"), lit(0L)).as("stress"),
        coalesce(col("n_pairs_on"), lit(0L)).as("n_pairs_on"))
      .orderBy("n_name")
  }

  // ---- community quality (X-MODULARITY) --------------------------------

  /** X-MODULARITY: Newman modularity of the X-LABELPROP partition — the
    * number that says whether the detected communities are REAL
    * structure or noise (Q ≈ 0: no better than random given the degree
    * sequence; Q ≳ 0.3: meaningful). Everything except ONE final
    * division stays exact integer: with W = Σ over the symmetrized
    * weighted edge frame (= 2m), per community c the internal ordered
    * weight e_c and weighted degree mass d_c give the exact contribution
    * numerator e_c·W − d_c², and Q_c = that / W² is the single fixed
    * IEEE op per row; the global Q is the column sum (the X-CHI2-DRIFT
    * drill-down convention: WHICH community carries the structure).
    * Labels come from the memoized [[labelTable]] — the LPA run is
    * shared with x_labelprop, never recomputed.
    *
    * Scale shape: the fact collapses to the aggregated edge frame once
    * (cached here for its three dim-sized consumers: W, degrees,
    * internal-weight join); everything after is ≤|V|²-row arithmetic.
    */
  def modularity(spark: SparkSession, sfDir: String): DataFrame =
      withDimLoopConf(spark) {
    val e = tradeEdges(spark, sfDir)
    val und = e.filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), col("w"))
      .union(e.filter(col("src") =!= col("dst"))
        .select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .cache()
    val labels = labelTable(spark, sfDir).select(col("id"), col("lab"))
    val wtot = und.agg(sum("w").as("W"))
    val degs = und.groupBy(col("src").as("id")).agg(sum("w").as("k"))
    val dc = labels.join(degs, Seq("id"))
      .groupBy("lab")
      .agg(count(lit(1)).as("n_nodes"), sum("k").as("d_c"))
    val ec = und
      .join(labels.select(col("id").as("src"), col("lab").as("lab_a")), Seq("src"))
      .join(labels.select(col("id").as("dst"), col("lab").as("lab_b")), Seq("dst"))
      .filter(col("lab_a") === col("lab_b"))
      .groupBy(col("lab_a").as("lab"))
      .agg(sum("w").as("e_c"))
    val out = dc.join(ec, Seq("lab"), "left")
      .crossJoin(broadcast(wtot))
      .select(col("lab").cast("long").as("community"), col("n_nodes"), col("d_c"),
        coalesce(col("e_c"), lit(0L)).as("e_c"),
        ((coalesce(col("e_c"), lit(0L)) * col("W") - col("d_c") * col("d_c"))
          .cast("double") / (col("W") * col("W")).cast("double")).as("q_contrib"))
      .orderBy("community")
      .localCheckpoint(true) // materialize before releasing the edge cache
    und.unpersist()
    out
  } // withDimLoopConf
}
