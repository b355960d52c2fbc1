package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Normalize, Schemas}
import graft.functions.RollingHash
import graft.llm.{Dedup, Multimodal, Similarity}

/** Unit + behavioral specs for everything the DuckDB oracle can't check
  * (SURVEY.md §5.2): rows-only operators, nested-array edge semantics,
  * the custom expression, and LSH recall against the exact baseline.
  */
class GraftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  // tests completed in this JVM — the plan-manifest spec uses it to tell a
  // full-suite run (memo caches already warm) from an isolated
  // `testOnly -z "plan manifest"` (caches cold, warm-up needed)
  private val testsRun = new java.util.concurrent.atomic.AtomicInteger(0)
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    testsRun.incrementAndGet()
    super.withFixture(test)
  }

  private def rawFromJson(lines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(Schemas.fbInsightsRaw).json(lines.toDS)
  }

  // ---- Normalize (T-PROJ / T-NEST / T-MISS / T-CAST) ------------------

  test("T-MISS: absent actions/conversions load as empty array, never null") {
    val raw = rawFromJson(Seq(
      """{"date_start":"1995-03-04","ad_id":"a1","ad_name":"n","adset_id":"s",
        |"adset_name":"sn","campaign_id":"c","campaign_name":"cn",
        |"clicks":"3","impressions":"10","spend":"1.5"}""".stripMargin.replaceAll("\n", "")))
    val row = Normalize(raw).head
    assert(row.getSeq[Any](row.fieldIndex("actions")) === Seq.empty)
    assert(row.getSeq[Any](row.fieldIndex("conversions")) === Seq.empty)
  }

  test("T-NEST: extra element keys are dropped, exactly {action_type, value} kept") {
    val raw = rawFromJson(Seq(
      """{"date_start":"1995-03-04","ad_id":"a1","ad_name":"n","adset_id":"s",
        |"adset_name":"sn","campaign_id":"c","campaign_name":"cn",
        |"clicks":"3","impressions":"10","spend":"1.5",
        |"actions":[{"action_type":"link_click","value":"96","1d_view":"10"}]}"""
        .stripMargin.replaceAll("\n", "")))
    val df = Normalize(raw)
    assert(df.schema("actions").dataType === Schemas.actionArray)
    val a = df.select(explode(col("actions"))).head.getStruct(0)
    assert(a.toSeq === Seq("link_click", "96"))
  }

  test("T-CAST: string metrics coerce to long/double/date") {
    val raw = rawFromJson(Seq(
      """{"date_start":"1995-03-04","ad_id":"a1","ad_name":"n","adset_id":"s",
        |"adset_name":"sn","campaign_id":"c","campaign_name":"cn",
        |"clicks":"128","impressions":"15360","spend":"73.45"}"""
        .stripMargin.replaceAll("\n", "")))
    val row = Normalize(raw).head
    assert(row.getAs[Long]("clicks") === 128L)
    assert(row.getAs[Long]("impressions") === 15360L)
    assert(row.getAs[Double]("spend") === 73.45)
    assert(row.getAs[java.sql.Date]("date").toString === "1995-03-04")
  }

  // ---- RollingHash custom expression ----------------------------------

  test("rolling_hash: codegen result matches reference implementation") {
    import spark.implicits._
    // codepoint-based (not bytes): encoding-stable and DuckDB-mirrorable
    val expected: String => Long = s =>
      s.codePoints().toArray.foldLeft(0L)((h, cp) => h * 31 + cp)
    val inputs = Seq("", "a", "hello world", "ünïcode ✓ text", "汉字 𝒳")
    val got = inputs.toDF("s")
      .select(RollingHash.rolling_hash(col("s"))).as[Long].collect()
    assert(got.toSeq === inputs.map(expected))
  }

  test("SQL registration: native functions callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
        |       simhash(array('a','b')) AS sh,
        |       dot_product(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |                   CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS dp""".stripMargin).head
    assert(r.getAs[Long]("rh") === ("abc".getBytes.foldLeft(0L)((h, b) => h * 31 + (b & 0xff))))
    assert(r.getAs[Double]("dp") === 11.0)
  }

  test("extensions: session built withExtensions resolves graft functions") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    // getOrCreate may return the existing session; either way the function
    // must resolve
    graft.functions.GraftFunctions.register(s2)
    assert(s2.sql("SELECT rolling_hash('x') AS h").head.getAs[Long]("h") === 'x'.toLong)
  }

  // ---- Dedup ----------------------------------------------------------

  /** Planted near-dups in the fixture share a 40-char prefix and have
    * ~0.98 whole-doc trigram jaccard (verified against the raw data).
    */
  private def plantedPairs: Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("p"))
    docs.as("a").join(docs.as("b"),
        col("a.p") === col("b.p") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("minhash LSH finds planted near-duplicate pairs (high true jaccard)") {
    val truth = plantedPairs
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val found = Dedup.minhashPairs(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.9, s"minhash recall $recall over ${truth.size} true pairs")
  }

  test("minhash estimate approximates true jaccard on candidates") {
    // truth at the same shingle size (k=8) the signature is built from
    val grams8 = array_distinct(transform(
      sequence(lit(1), length(col("text")) - 7), i => col("text").substr(i, lit(8))))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), grams8.as("g"))
    val withTruth = Dedup.minhashPairs(spark, sf)
      .join(docs.select(col("doc_id").as("id_a"), col("g").as("g_a")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("g").as("g_b")), Seq("id_b"))
      .select(abs(col("est_jaccard")
        - size(array_intersect(col("g_a"), col("g_b"))).cast("double")
          / size(array_union(col("g_a"), col("g_b"))).cast("double")).as("err"))
    assert(withTruth.count() > 0, "minhash should surface candidate pairs")
    val maxErr = withTruth.agg(max("err")).head.getDouble(0)
    assert(maxErr <= 0.35, s"max |est - true| = $maxErr")
  }

  test("simhash: identical texts collide, near-dups have small hamming") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) > 8)
  }

  // ---- Similarity -----------------------------------------------------

  test("lsh ANN scores agree exactly with brute force on shared pairs") {
    val brute = Similarity.bruteTopK(spark, sf)
      .select("qid", "cid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(spark, sf)
      .select("qid", "cid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exact same cosine wherever both paths scored a pair; the recall
    // guarantee lives in the planted-pair test below (the fixture's
    // uniform-random vectors have no meaningful neighbors to recall)
    val shared = lsh.keySet.intersect(brute.keySet)
    assert(shared.nonEmpty)
    shared.foreach(k => assert(math.abs(lsh(k) - brute(k)) < 1e-12))
  }

  test("lsh ANN: recall >= 0.8 on planted near-neighbor pairs") {
    import spark.implicits._
    val r = new java.util.Random(123)
    val nClusters = 50
    val rows = (0 until nClusters).flatMap { i =>
      val base = Array.fill(64)(r.nextGaussian())
      val partner = base.map(v => (v + r.nextGaussian() * 0.05).toFloat).toSeq
      val fillers = (2 until 10).map(j =>
        (i * 10L + j, Array.fill(64)(r.nextGaussian().toFloat).toSeq))
      Seq((i * 10L, base.map(_.toFloat).toSeq), (i * 10L + 1, partner)) ++ fillers
    }
    val df = rows.toDF("vec_id", "embedding")
    // stride 10 → each cluster's base vector is a query; its planted
    // partner (cosine ≈ 0.999) must surface in the LSH top-k
    val lsh = Similarity.lshTopKOf(df, stride = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until nClusters).count(i => lsh.contains((i * 10L, i * 10L + 1)))
    val recall = found.toDouble / nClusters
    assert(recall >= 0.8, s"planted-pair recall = $recall")
  }

  test("ivf ANN: high recall on clustered embeddings, exact scores") {
    val brute = Similarity.bruteTopK(spark, sf)
      .select("qid", "cid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(spark, sf)
      .select("qid", "cid", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = ivf.keySet.intersect(brute.keySet)
    shared.foreach(k => assert(math.abs(ivf(k) - brute(k)) < 1e-12))
    val recall = shared.size.toDouble / brute.size
    assert(recall > 0.3, s"ivf recall@10 = $recall")
  }

  test("ANN recall grading: recall_hits = |ANN∩brute| exactly; IVF clears 0.7; LSH clears 0.7 on clustered data") {
    val bruteSets = Similarity.bruteTopK(spark, sf)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def audit(df: org.apache.spark.sql.DataFrame): Double = {
      val byQ = df.select("qid", "cid", "recall_hits").collect().groupBy(_.getLong(0))
      val recalls = byQ.map { case (qid, rows) =>
        val hits = rows.map(_.getLong(2)).distinct
        assert(hits.length === 1, s"recall_hits must be constant per query (qid=$qid)")
        val annSet = rows.map(_.getLong(1)).toSet
        assert(hits.head === annSet.intersect(bruteSets(qid)).size.toLong,
          s"recall_hits must be exactly |ANN∩brute| (qid=$qid)")
        hits.head.toDouble / Similarity.K
      }
      recalls.sum / recalls.size
    }
    val lshMeanFixture = audit(Similarity.lshTopK(spark, sf)) // exactness; floor below
    val ivfMean = audit(Similarity.ivfTopK(spark, sf))
    assert(ivfMean >= 0.7, s"ivf mean recall@10 = $ivfMean")
    // IVF-PQ: same coarse probe, ADC-prefiltered + exact-reranked — must
    // meet the same accuracy contract as the unquantized IVF path
    val pqMean = audit(Similarity.ivfpqTopK(spark, sf))
    assert(pqMean >= 0.7, s"ivfpq mean recall@10 = $pqMean")
    // multi-probe: same index, query-side bucket expansion — must beat
    // single-probe recall even on the structureless fixture
    val mpMean = audit(Similarity.multiprobeTopK(spark, sf))
    assert(mpMean > lshMeanFixture,
      s"multi-probe recall ($mpMean) must beat single-probe ($lshMeanFixture)")
    // The fixture's vectors are uniform-random — the NO-STRUCTURE worst
    // case for bucketed ANN (every "neighbor" is barely closer than a
    // random point, so bucket collisions carry no signal; LSH measures
    // ~0.1-0.17 here and that is the honest number, recorded in the green
    // recall_hits column). The operator's accuracy contract is graded
    // where neighbors exist: planted near-duplicate clusters, where the
    // same pipeline must clear the same 0.7 floor end to end.
    import spark.implicits._
    val r = new java.util.Random(321)
    val rows = (0 until 30).flatMap { i =>
      val base = Array.fill(64)(r.nextGaussian())
      (0 until 10).map { j =>
        val v = if (j == 0) base else base.map(_ + r.nextGaussian() * 0.15)
        (i * 10L + j, v.map(_.toFloat).toSeq)
      }
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val bruteC = Similarity.bruteTopKOf(clustered, 10)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val lshC = Similarity
      .withRecall(Similarity.lshTopKOf(clustered, 10), clustered, 10)
      .select("qid", "recall_hits").collect()
      .groupBy(_.getLong(0)).map { case (_, rs) => rs.head.getLong(1).toDouble / Similarity.K }
    assert(bruteC.nonEmpty && lshC.nonEmpty)
    val lshMean = lshC.sum / lshC.size
    assert(lshMean >= 0.7, s"lsh mean recall@10 on clustered corpus = $lshMean")
  }

  test("ivf ANN: cell assignment is map-only (no window, no n×k shuffle)") {
    val df = Similarity.ivfTopK(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"assignment must fold the broadcast centroid array per row, not rank a cross product:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange hashpartitioning(vec_id"),
      "the corpus must not be shuffled for assignment")
  }

  test("ivfpq ANN: encode is map-only and the shortlist bounds the exchange") {
    val df = Similarity.ivfpqTopK(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"PQ encode must fold broadcast codebooks per row, not rank a cross product:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange hashpartitioning(vec_id"),
      "the corpus must not be shuffled for assignment or encoding")
    assert(plan.contains("TopKPerKey"),
      "ADC prefilter and final top-k must run through the bounded-heap operator")
  }

  test("x_sim_incr: delta assignment touches only the ingest; append equals full re-index") {
    val e = graft.Tables.embeddings(spark, sf)
    val (baseCells, deltaCells) = Similarity.incrIndexParts(e)
    val nDelta = e.filter(Similarity.isDeltaVec(col("vec_id"))).count()
    // cost: the day's assignment work is exactly the delta, not the corpus
    assert(deltaCells.count() === nDelta)
    assert(baseCells.count() + nDelta === e.count())
    // equivalence: base ∪ delta cells == a full re-index's assignment
    // (frozen centroids make per-vector assignment independent)
    val merged = baseCells.unionAll(deltaCells)
      .select("vec_id", "cent_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullAssign = Similarity.fullIndexCells(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged === fullAssign)
    // the served result surfaces ingest freshness
    val out = Similarity.simIncrTopK(spark, sf)
    val deltaHits = out.filter(col("cid") % 10 === 7).count()
    val reported = out.groupBy("qid").agg(max("delta_hits")).collect()
      .map(_.getLong(1)).sum
    assert(reported === deltaHits, "delta_hits must count exactly the delta members served")
  }

  test("x_sim_rrf: integer-ppm fusion, rank-bounded, both-lists beats either-alone") {
    val out = Similarity.rrfTopK(spark, sf).collect()
    assert(out.nonEmpty)
    val maxSingle = 1000000L / (Similarity.RrfC + 1) // rank-1 in one list
    val minDual = 2 * (1000000L / (Similarity.RrfC + Similarity.K))
    out.foreach { r =>
      val (rank, ppm, n) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(rank >= 1 && rank <= Similarity.K)
      assert(n == 1L || n == 2L)
      // each contribution is 1e6 div (C + rank) with rank in [1, K]
      assert(ppm >= 1000000L / (Similarity.RrfC + Similarity.K) && ppm <= 2 * maxSingle)
      if (n == 2L) assert(ppm >= minDual)
    }
    // a candidate both rankers retrieved always outranks a one-list
    // candidate: min dual contribution (2 × rank-K) > max single (rank-1)
    assert(minDual > maxSingle)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      val firstSingle = byRank.indexWhere(_.getLong(4) == 1L)
      if (firstSingle >= 0)
        assert(byRank.drop(firstSingle).forall(_.getLong(4) == 1L),
          "a both-lists candidate ranked below a one-list candidate")
    }
    // fused head = brute head whenever LSH agrees: rank-1 rows with
    // n_rankers=2 exist on the fixture (sanity that fusion actually fuses)
    assert(out.exists(r => r.getLong(1) == 1L && r.getLong(4) == 2L))
  }

  test("x_rank_metrics: brute calibration row is exact, rrf hits contain lsh hits") {
    val out = Similarity.rankMetrics(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet ===
      Set("brute", "ivf", "ivfpq", "knngraph", "lsh", "multiprobe", "rrf"))
    val (nq, bruteHits, _, _, _) = out("brute")
    // brute graded against itself must be perfect in all three metrics —
    // the built-in calibration row (floor divisions cancel exactly)
    assert(out("brute") === ((nq, nq * Similarity.K, 1000000L, 1000000L, 1000000L)))
    out.values.foreach { case (n, hits, recall, mrr, ndcg) =>
      assert(n === nq)
      assert(hits >= 0L && hits <= bruteHits)
      Seq(recall, mrr, ndcg).foreach(m => assert(m >= 0L && m <= 1000000L))
    }
    // every LSH hit is in both lists, so it lands in RRF's dual band —
    // which outranks every single-list candidate — hence RRF never loses
    // a hit LSH found (fusion may only add brute-only hits after them)
    assert(out("rrf")._2 >= out("lsh")._2,
      "rrf recall must dominate the lsh ranker it fuses")
  }

  test("x_kcenter: selection curve is nonincreasing and covers the corpus") {
    val out = Similarity.kcenter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === Similarity.KCenterK)
    assert(out.map(_._1) === (1L to Similarity.KCenterK.toLong))
    assert(out.map(_._2).distinct.length === out.length, "centers must be distinct")
    assert(out.head._3 === 0L, "the seed has no prior set to be far from")
    // farthest-point invariant: each selection distance is the covering
    // radius of the set chosen so far, so the curve never increases
    out.drop(1).sliding(2).foreach { pair =>
      val (a, b) = (pair(0), pair(1))
      assert(b._3 <= a._3, s"coverage curve increased: $a -> $b")
    }
    // coverage guarantee: after all K selections the corpus radius can
    // only have shrunk further from the last selection distance
    assert(Similarity.kcenterRadius(spark, sf) <= out.last._3)
  }

  test("x_mmr: full permutation of brute top-K with a nonincreasing selection score") {
    val mmr = Similarity.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val brute = Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(mmr.nonEmpty)
    mmr.groupBy(_._1).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2) === (1L to Similarity.K.toLong),
        s"$qid: mmr_rank must span 1..K")
      assert(byRank.map(_._3).toSet === brute(qid),
        s"$qid: MMR re-permutes the brute top-K, never swaps members")
      // the best available MMR score only falls as maxsim state grows
      byRank.sliding(2).foreach { pair =>
        assert(pair(1)._4 <= pair(0)._4,
          s"$qid: selection score increased ${pair(0)} -> ${pair(1)}")
      }
    }
  }

  test("x_pr_curve: confusion counts partition the corpus, tp/fp/recall fall as thr rises") {
    val out = llm.TextAnalysis.prCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.map(_._1) === llm.TextAnalysis.PrThresholds)
    val nDocs = Tables.documents(spark, sf).count()
    out.foreach { case (thr, tp, fp, fn, tn, p, rcl, f1) =>
      assert(tp + fp + fn + tn === nDocs, s"thr=$thr: counts must partition the corpus")
      Seq(p, rcl, f1).foreach(m => assert(m >= 0L && m <= 1000000L))
    }
    // raising the cutoff can only shrink the predicted-positive set, so
    // tp, fp, and recall (constant denominator) are nonincreasing
    out.sliding(2).foreach { pair =>
      val (a, b) = (pair(0), pair(1))
      assert(b._2 <= a._2 && b._3 <= a._3 && b._7 <= a._7,
        s"monotonicity broken between thr=${a._1} and thr=${b._1}")
    }
  }

  test("x_kanon: class accounting is internally consistent per source") {
    val docsPerSource = Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = llm.Profile.kanon(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet === docsPerSource.keySet)
    out.foreach { r =>
      val (src, nc, ns, risk, mn, mx) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ns <= nc, s"$src: singletons are classes")
      assert(risk >= ns, s"$src: at-risk docs include every singleton")
      assert(mn >= 1L && mn <= mx)
      assert(nc <= docsPerSource(src) && risk <= docsPerSource(src))
    }
  }

  test("x_priority_sample: HT adjustment floors at the threshold, tau=0 when all sampled") {
    val nDocs = Tables.documents(spark, sf).count()
    val out = llm.Sampling.prioritySample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.length === math.min(nDocs, llm.Sampling.PrioritySampleN.toLong).toInt)
    assert(out.map(_._1).distinct.length === out.length, "sampled docs are distinct")
    out.foreach { case (id, w, p, wEst) =>
      assert(wEst >= w.toDouble, s"doc $id: HT weight must never shrink below w")
      assert(p > 0.0)
    }
    if (nDocs <= llm.Sampling.PrioritySampleN)
      // everything sampled → τ = 0 → the estimator is exact: ŵ = w
      out.foreach { case (id, w, _, wEst) =>
        assert(wEst === w.toDouble, s"doc $id: all-sampled estimate must be exact")
      }
  }

  test("x_group_split: user sets are disjoint and events are conserved") {
    import spark.implicits._
    val out = llm.Sampling.groupSplit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ev = Tables.events(spark, sf)
    assert(out.values.map(_._2).sum === ev.count(), "every event lands in exactly one split")
    // the split key is the user hash, so materialized user sets must be
    // disjoint — THE property a per-row split cannot give you
    val sides = Seq("train", "test").map { s =>
      ev.select(col("user_id"),
          when(pmod(col("user_id") * 2654435761L, lit(llm.Sampling.GroupSplitM))
              < llm.Sampling.GroupSplitTrainLt, "train")
            .otherwise("test").as("split"))
        .filter(col("split") === s).select("user_id").distinct()
        .as[Long].collect().toSet
    }
    assert((sides(0) & sides(1)).isEmpty, "a user leaked across splits")
    assert(sides(0).size.toLong === out("train")._1)
    assert(sides(1).size.toLong === out("test")._1)
  }

  test("x_rebalance: minority label survives whole, others shrink toward it") {
    val out = llm.Sampling.rebalance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val nMin = out.map(_._2).min
    out.foreach { case (label, before, kept, _) =>
      assert(kept >= 1L && kept <= before, s"label $label: kept must be a subset")
    }
    val minority = out.filter(_._2 == nMin)
    minority.foreach { case (label, before, kept, _) =>
      assert(kept === before, s"minority label $label must survive whole (h < M always)")
    }
    // the hash-proportional rule lands each label NEAR n_min — allow the
    // deterministic-hash wobble but catch a broken proportion outright
    out.foreach { case (label, _, kept, _) =>
      assert(kept <= 2 * nMin, s"label $label kept $kept — proportioning broken vs $nMin")
    }
  }

  test("x_changepoint and x_autocorr: series coverage, bounds, and CUSUM endpoints") {
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    val cp = llm.Analytics.changepoint(spark, sf).collect()
    assert(cp.length.toLong === types, "one change-point row per event type")
    cp.foreach { r =>
      val (dev, n, before, after) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(dev >= 0L && n >= 1L)
      assert(before >= 0L && after >= 0L, "daily value means are nonnegative")
    }
    val ac = llm.Analytics.autocorr(spark, sf).collect()
    assert(ac.length.toLong === types * 3, "lags 1..3 per event type")
    ac.foreach { r =>
      assert(math.abs(r.getLong(3)) <= 1000000L,
        s"${r.getString(0)} lag ${r.getLong(1)}: |acf| is Cauchy-Schwarz-bounded by 1")
    }
  }

  test("x_rand_proj: JL distortion concentrates near 1e6 ppm, every label covered") {
    val rows = llm.Quantize.randProj(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length.toLong === labels, "one report row per label")
    rows.foreach { r =>
      val (n, avg, mn, mx) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n > 0)
      assert(mn > 0L && mn <= avg && avg <= mx, s"ppm stats ordered: $r")
      // JL concentration: the per-label MEAN distortion of a k=16
      // Rademacher projection sits well within [0.5, 2.0]× — individual
      // vectors range wider (the lemma's tail), the mean must not
      assert(avg > 500000L && avg < 2000000L, s"label mean distortion off the JL bound: $r")
    }
  }

  test("x_chi2_drift: contingency conservation and nonnegative contributions") {
    val rows = llm.Analytics.chi2Drift(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length.toLong === types)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === total,
      "the contingency table partitions every event")
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0, "chi-square contributions are nonnegative")
      assert(math.abs(r.getDouble(3) + r.getDouble(4) - (r.getLong(1) + r.getLong(2))) < 1e-6,
        "expected cells sum to the observed row total")
    }
  }

  test("x_mann_whitney: U conservation, rank-sum identity, tie mass bounds") {
    val rows = llm.Analytics.mannWhitney(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, u2a, u2b, tc) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(u2a + u2b === 2L * na * nb, "doubled U statistics must conserve 2·n_a·n_b")
      assert(u2a >= 0L && u2b >= 0L, "U statistics are nonnegative")
      val n = na + nb
      assert(tc >= 0L && tc <= n * n * n - n, "tie mass within [0, n^3 - n]")
      if (!r.isNullAt(6)) {
        val z = r.getDouble(6)
        // z shares the sign of 2U_a − n_a·n_b by construction
        assert(z.sign === (u2a - na * nb).sign.toDouble || z == 0.0)
      }
    }
    // every non-null-value event of a kept type is ranked exactly once
    val kept = rows.map(_.getString(0)).toSet
    val total = Tables.events(spark, sf)
      .filter(col("value").isNotNull && col("event_type").isin(kept.toSeq: _*))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === total)
    // tie_cube = sum(t^3 - t) overflows BIGINT at a ~2.1M-row tie block;
    // pin the fixture far under the bound so the documented DECIMAL(38)
    // escape hatch (r2_a AND tie_cube together) is demonstrably unneeded
    val maxTie = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long"))
      .count().agg(max("count")).head.getLong(0)
    assert(maxTie < 2000000L,
      s"max tie block $maxTie must stay inside the BIGINT-safe cube bound")
  }

  test("x_theilsen: pair domain complete, median slope consistent, robust to one outlier day") {
    val out = llm.Analytics.theilSen(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val (nDays, nPairs) = (r.getLong(0), r.getLong(1))
    assert(nPairs === nDays * (nDays - 1) / 2, "every day pair votes exactly once")
    assert(r.getLong(3) > 0L, "dx is a positive day gap")
    assert(r.getDouble(4) === r.getLong(2).toDouble / r.getLong(3).toDouble,
      "reported slope is the exact median pair's dy/dx")
  }

  test("x_path_topk: paths bounded by prefix, session mass dominated by top paths") {
    val rows = llm.Events.pathTopK(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= llm.Events.PathTopK)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)),
      "rows arrive in (n_sessions desc) order")
    rows.foreach { r =>
      val hops = r.getString(0).split(">")
      assert(hops.length >= 1 && hops.length <= llm.Events.PathPrefixLen)
      assert(r.getLong(2) <= r.getLong(1), "a user contributes >= 1 session per path")
    }
  }

  test("x_join_card: forecast equals the executed self-join size") {
    val rows = queries.ScaleQueries.joinCard(spark, sf).collect()
    assert(rows.length === queries.ScaleQueries.JoinCardTopK)
    val forecast = rows.head.getLong(6)
    // the whole point: Σ c² must equal the ACTUAL self-join cardinality
    val li = Tables.load(spark, sf, "lineitem").select("l_partkey")
    val actual = li.as("a").join(li.as("b"), "l_partkey").count()
    assert(forecast === actual, "per-key count products forecast the exact join size")
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) * r.getLong(1))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }

  test("x_temp_mix: isqrt exact, flattening compresses the mix toward uniform") {
    val rows = llm.Sampling.tempMix(spark, sf).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val (tokens, s) = (r.getLong(2), r.getLong(3))
      val x = BigInt(tokens) * llm.Sampling.TempMixScale
      assert(BigInt(s) * s <= x && BigInt(s + 1) * (s + 1) > x,
        s"s=$s is the exact integer sqrt of $x")
    }
    // temperature scaling must shrink the head's share and grow the tail's
    val byRaw = rows.sortBy(_.getLong(4))
    assert(byRaw.last.getLong(5) <= byRaw.last.getLong(4),
      "head source share shrinks under alpha=1/2")
    assert(byRaw.head.getLong(5) >= byRaw.head.getLong(4),
      "tail source share grows under alpha=1/2")
  }

  test("x_containment: bounded by set sizes, covers every banded candidate pair") {
    val rows = Dedup.containment(spark, sf).collect()
    val nPairs = Dedup.minhashPairsTable(spark, sf).count()
    assert(rows.length.toLong >= nPairs,
      "verified rows cover at least every banded candidate (plus anchor pairs)")
    val banded = Dedup.minhashPairsTable(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val have = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded.subsetOf(have), "no banded candidate is lost by the union")
    rows.foreach { r =>
      val (na, nb, nc, ca, cb) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nc <= math.min(na, nb), "intersection bounded by either set")
      assert(ca >= 0L && ca <= 1000000L && cb >= 0L && cb <= 1000000L)
      assert(ca >= cb === (na <= nb), "smaller set always has the larger containment")
    }
  }

  test("x_containment: anchor source catches short-doc-quoted-in-long-doc that banding misses") {
    import spark.implicits._
    // doc 2 = 2000 pseudo-random chars; doc 1 = a 60-char quote of it.
    // Jaccard ≈ 53/1993 ≈ 0.03 → per-band collision prob ≈ 0.03^4, so
    // the 16-band LSH essentially never proposes the pair — while
    // containment(A→B) is exactly 1.0 and doc 1's min shingle hash MUST
    // appear in doc 2's posting list.
    // LCG stream (NOT a polynomial mod 26 — that repeats every 26 chars
    // and would give the long doc just 26 distinct shingles)
    val long = {
      var x = 42L
      (1 to 2000).map { _ =>
        x = (x * 1103515245L + 12345L) % 2147483648L
        ('a' + (x % 26L).toInt).toChar
      }.mkString
    }
    val quote = long.substring(700, 760)
    val docs = Seq((1L, quote), (2L, long), (3L, long.reverse))
      .toDF("doc_id", "text")
    val hs = docs.select(col("doc_id"), Dedup.shingleHashes(col("text")).as("hs"))
      .filter(size(col("hs")) > 0)
    val bandedPairs = Dedup.candidatePairs(Dedup.signatures(docs))
    assert(!bandedPairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .contains((1L, 2L)), "symmetric banding misses the subset pair")
    val out = Dedup.containmentOf(hs, Dedup.containmentCandidates(hs, bandedPairs))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toMap
    assert(out.contains((1L, 2L)), "anchor source proposes the subset pair")
    assert(out((1L, 2L)) === 1000000L, "containment(A→B) reads exactly 1.0")
  }

  test("x_mm_dedup: digest manifest partitions the corpus into byte-identical groups") {
    val rows = llm.Multimodal.payloadDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length === rows.length, "digests are unique keys")
    val expected = Tables.documents(spark, sf)
      .groupBy("text").agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).sorted.sameElements(expected),
      "digest groups are exactly the byte-identical text groups")
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count(),
      "every doc lands in exactly one group")
  }

  test("x_mm_neardup: strided corruption caught that the md5 digest misses") {
    import spark.implicits._
    def lcgText(seed: Long, n: Int): String = {
      var x = seed
      (1 to n).map { _ =>
        x = (x * 1103515245L + 12345L) % 2147483648L
        ('a' + (x % 26L).toInt).toChar
      }.mkString
    }
    val base = lcgText(7L, 4000)
    // flip 5 scattered bytes: each lives in ≤ 4 strided 16-byte windows,
    // so ≤ 20 of ~997 shingles move — Jaccard ≈ 0.96, while the md5
    // digest (X-MM-DEDUP's key) changes completely
    val corrupt = Seq(400, 1200, 2000, 2800, 3600)
      .foldLeft(base)((s, p) => s.updated(p, if (s(p) == 'z') 'a' else 'z'))
    val docs = Seq((1L, base, "s1"), (2L, corrupt, "s2"), (3L, lcgText(99L, 4000), "s3"))
      .toDF("doc_id", "text", "source")
    val md5s = llm.Multimodal.withPayload(docs)
      .select(col("doc_id"), md5(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(md5s(1L) !== md5s(2L), "exact digest dedup cannot pair the copies")
    val out = llm.Multimodal.payloadNearDupOf(docs, llm.Multimodal.payloadShingles(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L)._4 === 1L && out(2L)._4 === 1L,
      "the corrupted copy is flagged near-dup in both directions")
    assert(out(1L)._2 === 2L && out(2L)._2 === 1L, "best partners are each other")
    assert(out(1L)._3 >= 900000L, "exact byte-shingle Jaccard stays ≥ 0.9")
    assert(out(3L) === ((0L, -1L, 0L, 0L)), "the unrelated doc has no candidates")
  }

  test("Q-IDEM-KEYED: rerun lands zero rows, new keys still land, q_idem still doubles") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_idem_keyed_spec")
    val path = dir.resolve("t").toString
    val batch = Seq((1L, "a", 10.0), (2L, "b", 20.0), (1L, "a", 10.0))
      .toDF("k1", "k2", "v")
    etl.Sink.appendKeyed(batch, path, Seq("k1", "k2"))
    assert(spark.read.parquet(path).count() === 2L,
      "within-batch duplicates on the key collapse at first commit")
    etl.Sink.appendKeyed(batch, path, Seq("k1", "k2"))
    assert(spark.read.parquet(path).count() === 2L,
      "a retried batch is a commit-time no-op")
    etl.Sink.appendKeyed(
      Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("k1", "k2", "v"),
      path, Seq("k1", "k2"))
    val rows = spark.read.parquet(path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
    assert(rows.toSeq === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)),
      "new keys land; an existing key's replayed payload does NOT overwrite")
    // the contract pair: the keyed sink is idempotent where the plain
    // append (reference fidelity, main.py:86-91) doubles
    val keyed = queries.EtlQueries.qIdemKeyed(spark, sf).head
    assert(keyed.getLong(0) === keyed.getLong(1))
    graft.streaming.Drain.deleteRecursively(dir)
  }

  test("X-MM-PIPELINE: stage counts reconcile with the standalone mm operators") {
    val stages = llm.Multimodal.mmPipeline(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(stages.keySet === Set("0_raw", "1_exact_dedup", "2_neardup_canonical", "3_resize"))
    // stage 0 == the meta projection's totals (X-MM-META)
    val meta = llm.Multimodal.meta(spark, sf)
      .agg(count(lit(1)), sum("n_bytes")).head
    assert(stages("0_raw") === ((meta.getLong(0), meta.getLong(1))))
    // stage 1 == one keeper per X-MM-DEDUP digest group
    val dedup = llm.Multimodal.payloadDedup(spark, sf).cache()
    assert(stages("1_exact_dedup")._1 === dedup.count())
    // stage 2: recompose the survivor set from the STANDALONE fragments —
    // digest keepers, the shared verified pair table thresholded at
    // NearDupPpm and restricted to keepers, components, the
    // largest-payload keeper rule — and match count AND bytes
    import org.apache.spark.sql.expressions.Window
    val keepers = dedup.select(col("keeper_id").as("doc_id"))
    val bytes = llm.Multimodal.meta(spark, sf).select(col("doc_id"), col("n_bytes"))
    val edges = llm.Multimodal.payloadNearDupPairsTable(spark, sf)
      .filter(col("jac_ppm") >= llm.Multimodal.NearDupPpm)
      .join(keepers.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
      .join(keepers.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
      .select("id_a", "id_b")
    val drop = llm.Graph.connectedComponents(edges)
      .join(bytes, col("id") === bytes("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("comp").orderBy(col("n_bytes").desc, col("doc_id"))))
      .filter(col("rn") > 1).select("doc_id")
    val survivors = keepers.join(drop, Seq("doc_id"), "left_anti").cache()
    val s2 = survivors.join(bytes, Seq("doc_id"))
      .agg(count(lit(1)), sum("n_bytes")).head
    assert(stages("2_neardup_canonical") === ((s2.getLong(0), s2.getLong(1))))
    // stage 3: the SAME survivors carrying X-MM-RESIZE's actual emitted
    // artifact sizes — the funnel's accounting matches the real rewrite
    val s3 = llm.Multimodal.resize(spark, sf)
      .join(survivors, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)), sum("n_bytes_out")).head
    assert(stages("3_resize") === ((s3.getLong(0), s3.getLong(1))))
    dedup.unpersist(); survivors.unpersist()
  }

  test("x_mm_text_join: categories partition each source and reconcile with both funnels") {
    val rows = llm.Multimodal.mmTextJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // per source the four categories partition the docs exactly
    rows.foreach { r =>
      assert(r.getLong(1) ===
        r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5))
    }
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    // reconciliation against the funnels' own stage counts: text
    // survivors (n_both + n_text_only) sum to x_pipeline's 3_near_dedup
    // docs; media survivors (n_both + n_media_only) to x_mm_pipeline's
    // 2_neardup_canonical docs — the join reads the SAME memoized sets
    // the funnels' rules define, so these must agree exactly
    val textStage = llm.Pipeline.stageCounts(spark, sf).collect()
      .find(_.getString(0) == "3_near_dedup").get.getLong(1)
    val mediaStage = llm.Multimodal.mmPipeline(spark, sf).collect()
      .find(_.getString(0) == "2_neardup_canonical").get.getLong(1)
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === textStage)
    assert(rows.map(r => r.getLong(2) + r.getLong(4)).sum === mediaStage)
    // the audit is non-degenerate on the fixture: the modalities
    // genuinely disagree somewhere and agree somewhere
    assert(rows.map(_.getLong(2)).sum > 0, "no pairable doc survived both funnels")
    assert(rows.map(r => r.getLong(3) + r.getLong(4)).sum > 0,
      "funnels never disagree — the audit would be vacuous")
  }

  test("x_mm oracle encoding assumption: documents.text is pure ASCII at every fixture SF") {
    // The byte-shingle oracle (OracleLlm.mmPairCtes) mirrors the
    // BinShingles BYTE kernel via unicode(substr(text, ...)) and window
    // positions over length(text) — valid only while every character's
    // UTF-8 encoding is one byte (codepoint < 128). A future fixture
    // with one multi-byte char would silently diverge oracle from kernel
    // as an opaque hash mismatch; this makes the assumption fail LOUDLY
    // with its name instead.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
      .foreach { dir =>
        val nonAscii = Tables.documents(spark, dir)
          .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
          .count()
        assert(nonAscii === 0L,
          s"$dir/documents.parquet has $nonAscii docs with multi-byte " +
            "chars — the mm byte-shingle oracle's codepoints-are-bytes " +
            "mirror no longer holds; rewrite mmPairCtes over real bytes")
      }
  }

  test("x_mm_neardup: per-doc manifest is total and candidate counts are symmetric") {
    val rows = llm.Multimodal.payloadNearDup(spark, sf).collect()
    assert(rows.length.toLong === Tables.documents(spark, sf).count(),
      "one manifest row per doc, singletons included")
    rows.foreach { r =>
      val (nc, bp, jac, nd) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(jac >= 0L && jac <= 1000000L)
      assert(nd === (if (jac >= llm.Multimodal.NearDupPpm) 1L else 0L))
      assert((nc === 0L) === (bp === -1L), "no candidates iff no partner")
    }
    assert(rows.map(_.getLong(1)).sum % 2 === 0L,
      "pair memberships count each candidate pair exactly twice")
  }

  test("x_sim_pq_serve: runtime filtering prunes the catalog index scan to probed cells") {
    sources.AnnIndexTable.lastPlannedCells.set(-1)
    val out = graft.queries.AnnServe.pqServe(spark, sf).collect()
    assert(out.nonEmpty)
    // ranks are dense 1..R per query
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length))
      assert(ranks.length <= llm.Similarity.PqRerank)
    }
    // the planned dirs are bounded by the probe budget, never the corpus
    val planned = sources.AnnIndexTable.lastPlannedCells.get()
    val probedMax = out.map(_.getLong(0)).distinct.length * llm.Similarity.NumProbes
    assert(planned > 0, "the index scan planned at least one cell")
    assert(planned <= probedMax,
      s"planned $planned cells exceeds the probe budget $probedMax")
    // deterministic pruning proofs against the registered catalog table:
    val cat = graft.queries.AnnServe.ensureAnnTables(spark, sf)
    val allCells = sources.AnnIndexTable.lastPlannedCells // hook
    // 1. static pushdown: a literal IN plans exactly those cell dirs
    allCells.set(-1)
    // two cell ids that exist under the pinned hash-order centroid law
    val centIds = llm.Similarity.centroidModelRows(Tables.embeddings(spark, sf))
      .select("cid").collect().map(_.getLong(0)).sorted.take(2)
    spark.sql(s"SELECT count(*) FROM $cat.ann.pq_index " +
        s"WHERE cent_id IN (${centIds.mkString(", ")})")
      .collect()
    assert(allCells.get() === 2,
      s"static IN pushdown must plan 2 dirs, planned ${allCells.get()}")
    // 2. runtime (join-driven) filtering: a selective real-source dim
    //    prunes the scan at execution, the DPP shape serving probes use
    allCells.set(-1)
    val dim = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(centIds: _*))
      .select(col("vec_id").as("cent_id")).distinct()
    val n = spark.table(s"$cat.ann.pq_index")
      .join(dim.hint("broadcast"), Seq("cent_id")).count()
    assert(n > 0)
    assert(allCells.get() === 2,
      s"runtime filtering must plan 2 dirs, planned ${allCells.get()}")
  }

  test("x_sim_filtered: label predicate reaches the index scan; postfilter prefixes prefilter") {
    sources.AnnIndexTable.lastPlannedCells.set(-1)
    sources.AnnIndexTable.drainPushedRowFilters() // clear other tests' scans
    val out = graft.queries.AnnServe.simFiltered(spark, sf).collect()
    assert(out.nonEmpty)
    // the scan pruned on the cell id (runtime filtering bounded by the
    // probe budget, never the corpus)...
    val planned = sources.AnnIndexTable.lastPlannedCells.get()
    val nq = out.map(_.getLong(1)).distinct.length
    assert(planned > 0 && planned <= nq * llm.Similarity.NumProbes,
      s"planned $planned cell dirs for $nq queries")
    // ...AND on the attribute predicate (pushed row filter applied at
    // parse time — the filter-then-rank contract). The drained log holds
    // exactly THIS query's scans: the prefilter scan pushed the label,
    // the postfilter comparison scan deliberately pushed nothing
    val scans = sources.AnnIndexTable.drainPushedRowFilters()
    assert(scans.exists(_.contains("label")),
      s"the label predicate must be pushed into the index scan, got: $scans")
    assert(scans.exists(_.isEmpty),
      s"the postfilter strategy must scan unfiltered, got: $scans")
    // every returned candidate carries the filter label
    val lab = graft.queries.AnnServe.FilterLabel
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(labels(r.getLong(3)) === lab,
      s"candidate ${r.getLong(3)} does not have label $lab"))
    // rank-then-filter is PROVABLY the m-prefix of filter-then-rank
    // (same candidate cells, same total order), so its recall is a
    // lower bound — the report exposes what the pushdown buys
    val pre = out.filter(_.getString(0) == "prefilter")
    val post = out.filter(_.getString(0) == "postfilter")
    assert(pre.nonEmpty)
    post.groupBy(_.getLong(1)).foreach { case (qid, ps) =>
      val preL = pre.filter(_.getLong(1) == qid).sortBy(_.getLong(2)).map(_.getLong(3))
      val postL = ps.toSeq.sortBy(_.getLong(2)).map(_.getLong(3))
      assert(postL == preL.take(postL.length).toSeq,
        s"postfilter list for qid $qid is not a prefix of prefilter's")
    }
    // measured recall floor vs the label-restricted brute truth: the
    // probe (2 of 5 cells at the fixture) must keep at least half of it
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val perQ = rows.groupBy(_.getLong(1)).map { case (_, rs) =>
        rs.head.getLong(5).toDouble / llm.Similarity.K }
      perQ.sum / perQ.size
    }
    val (rPre, rPost) = (recall(pre), recall(post))
    assert(rPre >= rPost, s"prefilter recall $rPre < postfilter $rPost")
    assert(rPre >= 0.5, s"prefilter recall floor 0.5 violated: $rPre")
    info(f"filtered-probe recall@${llm.Similarity.K}: prefilter $rPre%.3f, postfilter $rPost%.3f")
  }

  test("x_ann_compact: one data file per cell after compaction; served probe identical") {
    // standalone compaction flow on a fresh fragmented staging
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_compact")
      .toString + "/idx"
    llm.Similarity.pqIndexFrame(Tables.embeddings(spark, sf))
      .repartition(graft.queries.AnnServe.FragmentSlices)
      .write.mode("overwrite").partitionBy("cent_id").json(dir)
    def contents(): Seq[(Long, Long, Seq[Long])] =
      spark.read.json(dir)
        .select(col("vec_id").cast("long"), col("cent_id").cast("long"), col("codes"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
        .sortBy(t => (t._1, t._2))
    val beforeRows = contents()
    val (before, after) = graft.queries.AnnServe.compactCells(spark, dir)
    assert(before > after,
      s"compaction must reduce file count, got $before -> $after")
    // one data file per cell directory; superseded fragments vacuumed
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("cent_id="))
    assert(cellDirs.nonEmpty)
    assert(after === cellDirs.length)
    cellDirs.foreach { d =>
      val n = d.listFiles().count(f => f.isFile && f.getName.startsWith("part-"))
      assert(n === 1, s"cell dir ${d.getName} has $n data files after compaction")
    }
    // the rewrite preserved every row
    assert(contents() === beforeRows, "compaction must not change the data")
    // the registered compacted table serves the IDENTICAL probe answer
    val live = graft.queries.AnnServe.pqServe(spark, sf).collect().toSeq
    val compacted = graft.queries.AnnServe.compactServe(spark, sf).collect().toSeq
    assert(compacted === live,
      "the compacted index must serve the same shortlist as the live staging")
  }

  test("x_mm_cluster: groups are closed under the pair relation; keeper is the byte-mass argmax") {
    val pairs = llm.Multimodal.payloadNearDupPairsTable(spark, sf)
      .filter(col("jac_ppm") >= llm.Multimodal.NearDupPpm)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = llm.Multimodal.payloadCluster(spark, sf).collect()
    val bytes = llm.Multimodal.withPayload(Tables.documents(spark, sf))
      .select(col("doc_id"), length(col("payload")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild components driver-side (union-find) as the reference
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).map { case (_, ms) =>
        val sorted = ms.sorted
        val keeper = ms.maxBy(d => (bytes(d), -d))
        (sorted.min, ms.length.toLong, keeper, bytes(keeper),
          ms.map(bytes).sum)
      }.toSeq.sortBy(_._1)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got === expected, "cluster manifest equals the union-find reference")
    assert(rows.forall(_.getLong(1) >= 2L), "singletons are absent by contract")
  }

  test("x_quantile_sketch: descent rank error bounded; every level conserves the mass") {
    val rows = llm.QuantileSketch.quantileSketch(spark, sf).collect()
    assert(rows.length === llm.QuantileSketch.QsPcts.length)
    val cents = llm.QuantileSketch.centsOf(spark, sf).collect().map(_.getLong(0)).sorted
    val n = cents.length
    rows.foreach { r =>
      val target = r.getAs[Long]("target_rank")
      val est = r.getAs[Long]("est_cents")
      val lo = cents.count(_ < est)
      val hi = cents.count(_ <= est)
      val err =
        if (target - 1 >= lo && target - 1 < hi) 0L
        else math.min(math.abs(target - 1 - lo), math.abs(target - hi))
      assert(err.toDouble / n <= 0.05,
        s"p${r.getAs[Long]("p_pct")}: descent rank error $err of $n")
    }
    assert(rows.forall(_.getAs[Long]("n_values") === n.toLong))
    // conservation: every (level, hash-row) counter set sums to N — the
    // linearity that makes per-shard sketches mergeable by addition
    val sums = llm.QuantileSketch
      .cellsOf(llm.QuantileSketch.centsOf(spark, sf))
      .groupBy("level", "r").agg(sum("cnt").as("s")).collect()
    assert(sums.length === llm.QuantileSketch.QsLevels * 4)
    sums.foreach(s => assert(s.getAs[Long]("s") === n.toLong))
  }

  test("x_kcore: survivor set is a fixpoint of the peel and every member keeps >= k") {
    import llm.Graph
    val out = Graph.kcore(spark, sf).collect()
    assert(out.nonEmpty, "the trade backbone has a non-empty core")
    out.foreach(r => assert(r.getLong(1) >= Graph.KcoreK.toLong))
    // re-derive the thresholded undirected graph and peel ONE more round:
    // a converged k-core must be invariant under it
    val e = Graph.tradeEdges(spark, sf)
    val tot = e.agg(sum("w").as("sw"), count(lit(1)).as("ne"))
    val strong = e.crossJoin(broadcast(tot))
      .filter(col("w") * col("ne") > col("sw") && col("src") =!= col("dst"))
    val und = strong.select(col("src").as("a"), col("dst").as("b"))
      .union(strong.select(col("dst").as("a"), col("src").as("b"))).distinct()
    val nation = Tables.load(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val sIds = out.map(_.getString(0)).toSet
    val s = nation.filter(col("n_name").isin(sIds.toSeq: _*))
      .select(col("n_nationkey").cast("long").as("id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val degIn = und.selectExpr("CAST(a AS BIGINT)", "CAST(b AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => s(p._1) && s(p._2))
      .groupBy(_._1).map { case (n, es) => n -> es.length }
    assert(s.forall(n => degIn.getOrElse(n, 0) >= Graph.KcoreK),
      "one more peel round changes nothing — the output is the fixpoint")
    val nNodes = und.select("a").distinct().count()
    assert(s.size < nNodes, "the peel genuinely removes periphery nodes at this k")
  }

  test("x_link_pred: candidates are non-edges and counts match a driver-side recount") {
    import llm.Graph
    val out = Graph.linkPred(spark, sf).collect()
    assert(out.nonEmpty)
    val und = Graph.thresholdedUndirected(spark, sf)
      .selectExpr("CAST(a AS BIGINT)", "CAST(b AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = und.toSet
    val nbrs = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    out.foreach { r =>
      val (a, b, cn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(!edges((a, b)) && !edges((b, a)), s"($a,$b) must be a NON-edge")
      assert(cn === (nbrs(a) & nbrs(b)).size.toLong, "common-neighbor recount agrees")
      assert(r.getLong(5) <= 1000000L)
    }
  }

  test("x_stream_kmv: state refines across batches and equals the batch order statistic") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val work = java.nio.file.Files.createTempDirectory("graft_kmv_spec_")
    val src = work.resolve("src"); java.nio.file.Files.createDirectories(src)
    def stageChunk(name: String, mtimeSec: Long, hashes: Seq[Long]): Unit = {
      val tmp = work.resolve(s"tmp_$name")
      hashes.map(h => ("t", h)).toDF("event_type", "h")
        .coalesce(1).write.parquet(tmp.toString)
      val listing = java.nio.file.Files.list(tmp)
      val part = try listing.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
        finally listing.close()
      val dst = src.resolve(s"$name.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000))
    }
    // chunk 1: 100 big hashes saturate the sketch; chunk 2's smaller
    // hashes must REFINE state held across the batch boundary
    val big = (1L to 100L).map(_ * 1000L + 500L)
    val small = (1L to 50L)
    stageChunk("c1", 1, big)
    stageChunk("c2", 2, small)
    val ds = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("h",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
      .as[(String, Long)]
    val emitted = graft.streaming.Drain.toParquet(
      llm.StreamingOps.kmvStream(ds).toDF("event_type", "k_used", "kth_hash"),
      work, shufflePartitions = Some(4))
      .orderBy("kth_hash").collect()
    assert(emitted.length === 2, "one emission per micro-batch")
    val Array(second, first) = emitted // ordered by kth asc = (batch2, batch1)
    assert(first.getLong(1) === 64L && second.getLong(1) === 64L)
    assert(second.getLong(2) < first.getLong(2),
      "batch 2's smaller hashes shrink the kth value held in cross-batch state")
    // final sketch = 64 smallest of the distinct union (batch semantics)
    val expectedKth = (big ++ small).distinct.sorted.take(64).last
    assert(second.getLong(2) === expectedKth)
  }

  test("x_stream_kmv: final-state recovery is correct for UNSATURATED types") {
    import spark.implicits._
    // A sparse type never reaches KmvK=64 distinct hashes: while
    // unsaturated the emitted kth_hash GROWS batch over batch, so a
    // naive (max k_used, min kth_hash) recovery would pair the final
    // k_used with an EARLY batch's kth. The argmax recovery must pick
    // the final emission's pair instead.
    val emissions = Seq(
      // sparse type: 3 batches, growing sketch (k_used 2 -> 5 -> 9)
      ("sparse", 2L, 40L), ("sparse", 5L, 70L), ("sparse", 9L, 120L),
      // saturated type: kth shrinks once k_used = 64
      ("dense", 64L, 900L), ("dense", 64L, 700L), ("dense", 64L, 650L)
    ).toDF("event_type", "k_used", "kth_hash")
    val rec = llm.StreamingOps.recoverKmvFinal(emissions)
      .orderBy("event_type").collect()
    assert(rec.length === 2)
    val Array(dense, sparse) = rec
    assert(sparse.getLong(1) === 9L && sparse.getLong(2) === 120L,
      "unsaturated type recovers the FINAL (k_used, kth), not min kth")
    assert(dense.getLong(1) === 64L && dense.getLong(2) === 650L,
      "saturated type recovers the latest refinement (min kth at max k)")
  }

  test("x_ltv: cumulative is the prefix sum and purchase mass is conserved") {
    val rows = llm.Events.ltv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getDate(0)).foreach { case (_, cohort) =>
      val ordered = cohort.sortBy(_.getLong(1))
      var run = 0L
      ordered.foreach { r =>
        run += r.getLong(3)
        assert(r.getLong(4) === run, "cum_cents is the exact prefix sum")
        assert(r.getLong(5) === r.getLong(4) / r.getLong(2))
      }
    }
    val totalPurchase = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum === totalPurchase,
      "every purchase cent lands in exactly one (cohort, offset) cell")
  }

  test("x_time_to_convert: magnitude buckets bound their members and users counted once") {
    val rows = llm.Events.timeToConvert(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, n, lo, hi, tot) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo.toString.length.toLong === m && hi.toString.length.toLong === m,
        "min and max share the bucket's digit count")
      assert(lo <= hi && tot >= lo * n && tot <= hi * n)
    }
    // independent recount of converting users (first signup <= first purchase)
    val expected = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("us"))).as("s"),
        min(when(col("event_type") === "purchase", col("us"))).as("p"))
      .filter(col("s").isNotNull && col("p").isNotNull && col("p") >= col("s"))
      .count()
    assert(rows.map(_.getLong(1)).sum === expected)
  }

  test("x_ab_srm: unit conservation and the integer alarm matches the float statistic") {
    val r = llm.Analytics.abSrm(spark, sf).head()
    val (n0, n1) = (r.getLong(0), r.getLong(1))
    assert(n0 + n1 === Tables.events(spark, sf).select("user_id").distinct().count())
    assert(r.getLong(2) === n0 * 1000000L / (n0 + n1))
    val chi2 = r.getDouble(3)
    assert(chi2 === (n0 - n1).toDouble * (n0 - n1) / (n0 + n1))
    assert((r.getLong(4) === 1L) === ((n0 - n1) * (n0 - n1) * 100L > 384L * (n0 + n1)),
      "the alarm is the exact cross-multiplied form of chi2 > 3.84")
  }

  test("x_mann_whitney plan: the shuffle carries distinct values, never events") {
    val plan = llm.Analytics.mannWhitney(spark, sf)
      .queryExecution.executedPlan.toString
    // exchanges allowed: the (type, cents) contingency agg and the final
    // per-type window/rollup — both keyed on the distinct-value frame.
    // An exchange on event_id would mean raw events crossed the wire.
    assert(!plan.contains("hashpartitioning(event_id") &&
      !plan.contains("hashpartitioning(user_id"),
      s"raw events must never shuffle:\n${plan.take(2000)}")
    assert(plan.contains("partial"), "the contingency agg must map-side combine")
  }

  test("x_join_card plan: heavy keys via take-ordered, totals broadcast as one row") {
    val plan = queries.ScaleQueries.joinCard(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top keys must not materialize a global sort:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      "the one-row totals must broadcast")
  }

  test("x_bloom_fpr: no false negatives possible, observed FPR consistent with load") {
    val r = llm.Events.bloomFpr(spark, sf).head()
    val (m, nIns, nSet, nProbes, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(m === llm.Events.BloomBits)
    assert(nSet >= 1L && nSet <= math.min(m, nIns * llm.Events.BloomBases.length),
      "set bits bounded by k·n and by m")
    assert(nFp >= 0L && nFp <= nProbes)
    assert(r.getLong(5) === nFp * 1000000L / nProbes)
    // disjointness of the probe set: inserted + probed = all distinct users
    val allUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(nIns + nProbes === allUsers)
    assert(nIns > 0L && nProbes > 0L, "both cohorts must be non-empty for the FPR to mean anything")
    // no false negatives: every INSERTED user must hit all its own bits —
    // re-probe the inserted cohort through the same filter construction
    import graft.functions.PolyHash
    val buyers = Tables.events(spark, sf).select("user_id").distinct()
      .filter(pmod(col("user_id"), lit(2L)) === 0L)
    val bits = buyers.select(col("user_id"),
      explode(array(llm.Events.BloomBases.map(b =>
        pmod(PolyHash.poly_hash(col("user_id").cast("string"), b),
          lit(llm.Events.BloomBits))): _*)).as("h"))
    val words = bits
      .select(expr("h div 32").as("w"),
        expr("shiftleft(1L, CAST(h % 32 AS INT))").as("mask"))
      .groupBy("w").agg(expr("bit_or(mask)").as("word"))
    val misses = bits
      .select(col("user_id"), expr("h div 32").as("w"),
        expr("shiftleft(1L, CAST(h % 32 AS INT))").as("mask"))
      .join(words, Seq("w"))
      .filter(col("word").bitwiseAND(col("mask")) === 0L)
      .count()
    assert(misses === 0L, "a Bloom filter can never false-negative its own members")
  }

  test("x_marginal_coverage: marginal counts partition the distinct shingle universe") {
    val rows = llm.Dedup.marginalCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val universe = Tables.documents(spark, sf)
      .select(explode(llm.Dedup.shingleHashes(col("text"))).as("h"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum === universe,
      "every distinct shingle is first-owned by exactly one source")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "a source's novel shingles are a subset of its shingles")
      assert(r.getLong(3) <= 1000000L)
    }
    // the lexicographically FIRST source owns everything it touches
    val first = rows.map(_.getString(0)).min
    val fr = rows.find(_.getString(0) == first).get
    assert(fr.getLong(1) === fr.getLong(2), "the first source's shingles are all novel")
  }

  test("x_impute: only error rows are imputed and the fill is the weekday median") {
    val rows = llm.Analytics.impute(spark, sf).collect()
    assert(rows.nonEmpty)
    val errByDow = Tables.events(spark, sf)
      .filter(col("event_type") === "error")
      .select((dayofweek(col("ts")) - 1).cast("long").as("dow"))
      .groupBy("dow").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (dow, n, imp, med, filled) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(imp === errByDow.getOrElse(dow, 0L), s"dow $dow imputes exactly its error rows")
      assert(imp < n, "valid rows exist on every weekday (the median is defined)")
      assert(filled >= med * imp, "the fill contributes median · imputed to the sum")
    }
  }

  test("x_target_enc: encodings are leave-one-out exact and bounded by category extremes") {
    val rows = llm.Analytics.targetEnc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getLong(2), r.getLong(3))
      if (n > 1L) {
        val (lo, hi, sum) = (r.getLong(4), r.getLong(5), r.getLong(6))
        assert(lo <= hi)
        assert(sum >= lo * n && sum <= hi * n)
        // LOO extremes: dropping the LARGEST target yields the smallest
        // encoding and vice versa — both bounded by the category mean
        assert(lo <= s / n && hi >= (s - (s / n)) / math.max(n - 1L, 1L) - 1L)
      } else {
        assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6),
          "a 1-row category has no leave-one-out encoding")
      }
    }
  }

  test("x_closeness: BFS converged inside the unroll and distances recount exactly") {
    import llm.Graph
    val out = Graph.closeness(spark, sf).collect()
    assert(out.nonEmpty)
    // max eccentricity strictly under the round cap PROVES the fixpoint:
    // round r can only add nodes at distance exactly r
    assert(out.map(_.getLong(3)).max < Graph.ClosenessRounds.toLong)
    // brute recount on the collected graph
    val und = Graph.thresholdedUndirected(spark, sf)
      .selectExpr("CAST(a AS BIGINT)", "CAST(b AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nation = Tables.load(spark, sf, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name")
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    out.foreach { r =>
      val src = nation(r.getString(0))
      var frontier = Set(src); var seen = Map(src -> 0L); var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(seen.contains)
        seen ++= frontier.map(_ -> d)
      }
      assert(r.getLong(1) === seen.size.toLong, s"${r.getString(0)}: reached count")
      assert(r.getLong(2) === seen.values.sum, s"${r.getString(0)}: distance sum")
    }
  }

  test("x_modularity: contributions sum to a sane Q and masses conserve") {
    import llm.Graph
    val rows = Graph.modularity(spark, sf).collect()
    assert(rows.nonEmpty)
    val q = rows.map(_.getDouble(4)).sum
    assert(q > -1.0 && q < 1.0, s"modularity Q = $q out of range")
    // Σd_c = W (every endpoint's weighted degree lands in one community)
    // and Σe_c <= W (internal ordered weight is a subset of all weight)
    val e = Graph.tradeEdges(spark, sf)
      .filter(col("src") =!= col("dst"))
      .agg(sum(col("w") * 2)).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum === e, "degree mass conserves to W")
    assert(rows.map(_.getLong(3)).sum <= e)
    // labels shared with x_labelprop: community count matches
    val comms = Graph.labelProp(spark, sf).collect().map(_.getLong(1)).distinct.length
    assert(rows.length === comms)
  }

  test("x_lsh_curve: S-curve is monotone with the designed midpoint; buckets conserve pairs") {
    val rows = llm.Dedup.lshCurve(spark, sf).collect()
    assert(rows.length === 20)
    val ps = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    ps.sliding(2).foreach { case Array(a, b) => assert(a <= b, "P(s) is monotone in s") }
    // the 16x4 design point: P(0.5) sits mid-curve (the threshold story)
    val p50 = rows.find(_.getLong(0) == 50L).get.getDouble(1)
    assert(p50 > 0.3 && p50 < 0.9, s"P(0.5) = $p50 should sit on the S-curve's steep flank")
    assert(rows.map(_.getLong(2)).sum === llm.Dedup.minhashPairsTable(spark, sf).count(),
      "every banded pair lands in exactly one similarity bucket")
  }

  test("x_ab_power: required n shrinks quadratically in MDE and matches a direct recompute") {
    val rows = llm.Analytics.abPower(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.length === 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) >= b.getLong(3), "a larger MDE never needs more samples") }
    rows.foreach { r =>
      val (m, nU, nC, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val p = nC.toDouble / nU.toDouble
      val z = llm.Analytics.PowerZAlpha + llm.Analytics.PowerZBeta
      val expected = math.ceil(z * z * (2.0 * p * (1.0 - p)) / ((m / 100.0) * (m / 100.0))).toLong
      assert(n === expected, s"mde=$m%")
      assert((r.getLong(4) === 1L) === (n * 2L <= nU))
    }
  }

  test("x_mm_resize: strided artifact recounts exactly and the ASCII contract holds") {
    // the SQL mirror equates bytes with chars — valid only while the
    // payload is ASCII; this assertion is the tripwire if the fixture
    // ever grows multi-byte text
    val nonAscii = Tables.documents(spark, sf)
      .filter(length(col("text")) =!= octet_length(encode(col("text"), "UTF-8")))
      .count()
    assert(nonAscii === 0L, "resize's SQL mirror requires 1 byte per char")
    val rows = llm.Multimodal.resize(spark, sf).collect()
    assert(rows.length.toLong === Tables.documents(spark, sf).count())
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.take(25).foreach { r =>
      val p = texts(r.getLong(0)).getBytes("UTF-8")
      val out = Array.tabulate((p.length + 3) / 4)(i => p(i * 4))
      md.reset()
      assert(r.getLong(1) === p.length.toLong)
      assert(r.getLong(2) === out.length.toLong)
      assert(r.getString(3) === md.digest(out).map("%02x".format(_)).mkString,
        s"doc ${r.getLong(0)}: resized artifact digest")
    }
  }

  test("x_hash_features: gram mass conserved, signs balanced, buckets in range") {
    val rows = llm.TextAnalysis.hashFeatures(spark, sf).collect()
    val totalGrams = Tables.documents(spark, sf)
      .select(llm.TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .agg(sum(size(col("toks")) - 1)).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum === totalGrams,
      "every bigram occurrence lands in exactly one bucket")
    rows.foreach { r =>
      val (b, n, s, d) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(b >= 0 && b < llm.TextAnalysis.HashFeatDims.toLong)
      assert(math.abs(s) <= n, "signed sum is bounded by the occurrence count")
      assert(d >= 1 && d <= n, "distinct load within [1, n]")
    }
  }

  test("x_canonical and x_hubness: keeper rule and in-degree conservation") {
    import spark.implicits._
    // canonical: a 3-chain cluster keeps the longest member, not the min id
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d e f g h"), (3L, "a b")
    ).toDF("doc_id", "text")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = llm.Dedup.canonicalOf(docs, edges).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 1L, "cluster labeled by min member id")
    assert(got.head.getLong(1) === 3L)
    assert(got.head.getLong(2) === 2L, "keeper is the longest member, not min id")
    assert(got.head.getLong(3) === 8L && got.head.getLong(4) === 13L)
    // hubness: in-degrees over the kNN graph conserve queries × k edges
    val rows = llm.Similarity.hubness(spark, sf).collect()
    val brute = llm.Similarity.bruteTopK(spark, sf)
    val edgesTotal = brute.count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === edgesTotal,
      "Σ in_degree·count equals the kNN edge total")
    val corpusN = Tables.embeddings(spark, sf)
      .filter(expr("sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * x), 0D, (a, b) -> a + b)) > 0")).count()
    assert(rows.map(_.getLong(1)).sum === corpusN,
      "every corpus vector (antihubs included) lands in exactly one bucket")
  }

  test("x_survival: monotone curve, risk-set conservation, censoring respected") {
    val rows = llm.Analytics.survival(spark, sf).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === users,
      "every user exits exactly once (death or censoring)")
    // n_at_risk at the smallest t is the full population
    val byT = rows.sortBy(_.getLong(0))
    assert(byT.head.getLong(1) === users, "everyone is at risk at the first step")
    // survival is a product of factors ≤ 1: non-increasing in t, in [0, 1e6]
    byT.map(_.getLong(4)).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, "survival curve must be non-increasing")
    }
    byT.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L)
      assert(r.getLong(1) >= r.getLong(2), "deaths cannot exceed the risk set")
    }
    // censored exits cluster at the horizon by construction
    val maxT = byT.last
    assert(maxT.getLong(3) > 0L, "horizon-adjacent users are censored, not churned")
  }

  test("x_cuped: variance reduction is real and the adjustment preserves the mean") {
    val rows = llm.Analytics.cuped(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (n, nA, nB) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n === nA + nB, "variants partition the users")
    val rho2 = r.getDouble(6)
    assert(rho2 >= 0.0 && rho2 <= 1.0, s"rho2 is a squared correlation: $rho2")
    assert(!r.getDouble(3).isNaN && !r.getDouble(5).isNaN)
    // pre-period spend predicts post-period spend on this fixture, so the
    // adjustment must buy a real variance reduction
    assert(rho2 > 0.01, s"pre-period covariate carries no signal: rho2 = $rho2")
  }

  test("x_pca: Rayleigh quotient non-decreasing per round, top-eigenvalue dominance") {
    val q = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 1024).cast("long")).as("q"))
    val (n, c) = llm.Pca.scatterOf(q)
    assert(n > 0)
    val trace = (0 until llm.Pca.Dims).map(i => c(i)(i)).sum
    val vs = llm.Pca.powerIterate(c, llm.Pca.Rounds)
    val rq = vs.map(v => llm.Pca.rayleigh(c, v))
    // power iteration on a PSD matrix: the Rayleigh quotient never drops
    rq.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"Rayleigh quotient dropped: $rq")
    }
    // the converged quotient must dominate the average eigenvalue
    // (trace/dims) — strictly, unless the spectrum is flat
    assert(rq.last * llm.Pca.Dims >= trace,
      s"top-PC variance ${rq.last} below the spectrum average ${trace / llm.Pca.Dims}")
    val rows = llm.Pca.pca(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length.toLong === labels)
    rows.foreach { r =>
      assert(r.getLong(4) >= r.getLong(3), "proj_max >= proj_min")
      assert(r.getLong(5) > 0L, "variance along the top PC is positive")
    }
  }

  test("x_stream_anomaly: the stateful stream equals the batch prefix-window monitor") {
    import org.apache.spark.sql.expressions.Window
    val streamed = llm.StreamingOps.streamingAnomaly(spark, sf).collect()
    // batch equivalent: prior-gap moments as prefix windows, same z² ints
    val raw = Tables.eventsRaw(spark, sf)
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    val wp = w.rowsBetween(Window.unboundedPreceding, -1)
    val g = raw.selectExpr("event_type",
        Tables.tsMicrosExpr(raw.schema) + " AS us", "coalesce(event_id, 0L) AS event_id")
      .withColumn("gap", expr("(us - lag(us) over (partition by event_type order by us, event_id)) div 1000000"))
      .filter(col("gap").isNotNull)
      .withColumn("n", count(lit(1)).over(wp))
      .withColumn("s", coalesce(sum("gap").over(wp), lit(0L)))
      .withColumn("q", coalesce(sum(col("gap") * col("gap")).over(wp), lit(0L)))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val flagged = g.filter(col("n") >= llm.StreamingOps.AnomalyWarmup &&
        (col("n").cast(dec) * col("gap").cast(dec) - col("s").cast(dec)) *
          (col("n").cast(dec) * col("gap").cast(dec) - col("s").cast(dec)) >
          lit(llm.StreamingOps.AnomalyZsq).cast(dec) *
            (col("n").cast(dec) * col("q").cast(dec) - col("s").cast(dec) * col("s").cast(dec)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_flagged"), sum("event_id").as("flagged_id_sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    streamed.foreach { r =>
      val (typ, nf, ids) = (r.getString(0), r.getLong(2), r.getLong(3))
      val (bn, bids) = flagged.getOrElse(typ, (0L, 0L))
      assert(nf === bn, s"$typ: stream flag count diverges from batch prefix")
      assert(ids === bids, s"$typ: stream flagged-id checksum diverges from batch prefix")
      assert(nf > 0, s"$typ: the exponential inter-arrival tail must flag something")
    }
  }

  test("x_labelprop: two cliques joined by a weak bridge resolve to two communities") {
    import spark.implicits._
    // K4 on {0..3} and K4 on {10..13}, heavy internal weight, one weak
    // bridge 3–10: LPA must NOT merge across the bridge (components would)
    val clique = (ids: Seq[Long]) =>
      for (a <- ids; b <- ids if a < b) yield (a, b, 10L)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((3L, 10L, 1L))).toDF("src", "dst", "w")
    val labels = llm.Graph.labelPropOf(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet === Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L))
    val c1 = Set(0L, 1L, 2L, 3L).map(labels)
    val c2 = Set(10L, 11L, 12L, 13L).map(labels)
    assert(c1.size === 1, s"left clique converged to one label: $labels")
    assert(c2.size === 1, s"right clique converged to one label: $labels")
    assert(c1 != c2, s"weak bridge must not merge the cliques: $labels")
    // the fixture query: every nation labeled, sizes partition the graph
    val rows = llm.Graph.labelProp(spark, sf).collect()
    val nations = Tables.load(spark, sf, "nation").count()
    assert(rows.length.toLong === nations)
    val bySize = rows.groupBy(_.getLong(1)).map { case (_, g) =>
      g.head.getLong(2) -> g.length.toLong }
    bySize.foreach { case (size, n) => assert(size === n, "comm_size matches membership") }
  }

  test("x_conformal: fold discipline, rank bounds, and coverage near the target") {
    val rows = llm.Analytics.conformal(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTrain, nCal, nTest) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (qHat, covered, ppm) = (r.getDouble(6), r.getLong(7), r.getLong(8))
      assert(nTrain > 0 && nCal > 0 && nTest > 0)
      assert(qHat >= 0.0, "interval half-width is an absolute residual")
      assert(covered >= 0 && covered <= nTest)
      // split-conformal guarantee: coverage ≥ 1−α in expectation; allow
      // fixture-sized sampling slack below, none of the bound's logic above
      assert(ppm > 700000L && ppm <= 1000000L,
        s"${r.getString(0)}: test coverage $ppm ppm far from the 90% target")
    }
    // fold disjointness is by construction (orderkey mod 4); assert the
    // three splits partition the joined fact count
    val joined = Tables.orders(spark, sf).join(
      Tables.load(spark, sf, "customer"),
      col("o_custkey") === col("c_custkey")).count()
    val halfTrain = rows.map(_.getLong(1)).sum
    val cal = rows.map(_.getLong(2)).sum
    val test = rows.map(_.getLong(3)).sum
    assert(halfTrain + cal + test === joined, "folds partition the facts")
  }

  test("x_did and x_bootstrap: cell conservation, CI ordering, and replica sanity") {
    val did = llm.Analytics.did(spark, sf).collect()
    assert(did.length === 1)
    val d = did.head
    // every (user, period) cell row is counted exactly once across the 2×2
    val userPeriods = Tables.events(spark, sf)
      .select(col("user_id"),
        when(to_date(col("ts")) >= to_date(lit(llm.Analytics.DidCutoff)), "post")
          .otherwise("pre").as("period"))
      .distinct().count()
    assert(d.getLong(0) + d.getLong(2) + d.getLong(4) + d.getLong(6) === userPeriods,
      "2x2 cell user counts partition the user-period rows")
    assert(!d.getDouble(8).isNaN, "DiD point estimate is defined on the fixture")
    val bs = llm.Analytics.bootstrapCi(spark, sf).collect()
    assert(bs.length === 1)
    val b = bs.head
    assert(b.getLong(0) === llm.Analytics.BootstrapB.toLong)
    val (point, lo, hi) = (b.getLong(1), b.getLong(2), b.getLong(3))
    assert(lo <= hi, "CI order statistics are ordered")
    // the resampling interval should bracket a neighborhood of the point
    // estimate: Poisson replica means are centered on the sample statistic
    assert(lo <= point && point <= hi,
      s"point $point outside bootstrap CI [$lo, $hi] — replica draws are biased")
  }

  test("x_dedup_cluster: transitive closure drops chain members the pairwise rule misses") {
    import spark.implicits._
    // component {1,2,3,4} via edges (1,3),(2,4),(3,4): node 2 never
    // appears as an id_b, so the pairwise higher-id rule keeps it while
    // closure drops it — extra_vs_pairwise must isolate exactly that doc.
    val docs = Seq(
      (1L, "sA", "aaaa"), (2L, "sA", "bb"), (3L, "sB", "cccc"),
      (4L, "sB", "dd"), (5L, "sB", "eeeeee"))
      .toDF("doc_id", "source", "text")
    val edges = Seq((1L, 3L), (2L, 4L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.dedupClusterOf(docs, edges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // sA: doc 1 kept (canonical min of the component), doc 2 dropped by
    // closure only → extra_vs_pairwise = 1
    assert(out("sA") === ((1L, 4L, 1L, 1L)))
    // sB: docs 3,4 dropped (both are id_b's → no extra), doc 5 untouched
    assert(out("sB") === ((1L, 6L, 2L, 0L)))
  }

  test("x_dedup_cluster: fixture accounting is self-consistent and closure never under-drops pairwise") {
    val out = Dedup.dedupCluster(spark, sf).collect()
    assert(out.nonEmpty)
    val docsPerSource = Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (src, kept, dropped, extra) =
        (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(kept + dropped === docsPerSource(src),
        s"$src: kept+dropped must partition the source's docs")
      assert(extra >= 0L && extra <= dropped)
    }
  }

  test("x_dedup_exact: shuffle key is the hash pair, never document text") {
    val df = llm.Dedup.exact(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(h64"),
      s"expected the 8-byte hash as the leading shuffle key:\n${plan.take(2000)}")
    assert(!plan.contains("hashpartitioning(text"),
      "exact dedup must not shuffle full document text as the group key")
  }

  test("x_dup_spans_cut: planted shared passage is excised from the non-keeper only") {
    import spark.implicits._
    val passage = (1 to 12).map(i => s"dup$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      (1L, "a", s"alpha beta $passage gamma delta"),
      (2L, "b", s"one two three four five six seven $passage eight nine"),
      (3L, "c", "totally unrelated text with enough tokens to stay clear of everything here"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.dupSpansCutCorpus(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // keeper (min doc_id) and the untouched doc pass through byte-identical
    assert(out(1L).getString(2) === s"alpha beta $passage gamma delta")
    assert(!out(1L).getBoolean(5) && !out(3L).getBoolean(5))
    // non-keeper: the shared 12-token passage (5 windows of 8, one island
    // covering tokens 8..19) is cut; surrounding tokens survive
    assert(out(2L).getBoolean(5))
    assert(out(2L).getString(2) === "one two three four five six seven eight nine")
    assert(out(2L).getLong(4) === 12L)
    // token conservation: kept + cut == before, for every doc
    Dedup.dupSpansCutCorpus(docs).collect().foreach { r =>
      val kept = r.getString(2).split("\\s+").count(_.nonEmpty)
      assert(kept + r.getLong(4) === r.getLong(3),
        s"doc ${r.getLong(0)}: kept=$kept cut=${r.getLong(4)} before=${r.getLong(3)}")
    }
  }

  test("x_dedup_pipeline / x_pipeline: exact-stage Exchange carries hashes, not text") {
    for ((df, label) <- Seq(
        (llm.Dedup.dedupPipeline(spark, sf), "dedupPipeline"),
        (llm.Pipeline.stageCounts(spark, sf), "stageCounts"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("hashpartitioning(text"),
        s"$label must key its exact-dedup stage on the (h64, h31, len) triple, " +
          s"never the raw text column:\n${plan.take(2000)}")
    }
  }

  test("documents fixture is ASCII (x_mm_features oracle equates bytes and codepoints)") {
    val n = Tables.documents(spark, sf)
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(n === 0, "fakeDecode hashes UTF-8 bytes; the DuckDB mirror uses codepoints")
  }

  test("MinHashMerge plans as HashAggregate (fixed-width slot buffer)") {
    val merged = Dedup.signatureTable(spark, sf)
      .agg(graft.functions.MinHashMerge.minhash_merge(col("sig")))
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"),
      s"array buffers fall back to SortAggregate — slots must stay primitive:\n${plan.take(1500)}")
  }

  test("MinHashMerge aggregate: group signature = elementwise min of members") {
    val docSigs = Tables.documents(spark, sf)
      .select(col("source"), Dedup.shingleHashes(col("text")).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("source"), graft.functions.MinHashSig.minhash_sig(col("hs")).as("sig"))
    val merged = docSigs.groupBy("source")
      .agg(graft.functions.MinHashMerge.minhash_merge(col("sig")).as("msig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val manual = docSigs.collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.map(_.getSeq[Long](1)).reduce((a, b) => a.zip(b).map(t => t._1 min t._2)).toSeq
      }
    assert(merged === manual)
  }

  test("dedup pipeline: survivors exclude exact dups and minhash near-dup partners") {
    val total = Tables.documents(spark, sf).count()
    val kept = Dedup.dedupPipeline(spark, sf)
      .agg(sum("n_kept")).head.getLong(0)
    val nearDropped = Dedup.minhashPairs(spark, sf)
      .filter(col("est_jaccard") >= Dedup.NearDupThreshold)
      .select("id_b").distinct().count()
    // all texts distinct in fixture → only near-dup drops apply; candidate
    // pairs below the threshold are banding noise and must NOT be dropped
    assert(kept === total - nearDropped)
    assert(nearDropped > 0, "fixture contains planted near-dups above threshold")
  }

  // ---- Multimodal stub ------------------------------------------------

  test("fake decode: exact histogram + checksum for a known payload") {
    val (feat, checksum) = Multimodal.fakeDecode("abc".getBytes("UTF-8"))
    // 'a'=97 -> bin 1, 'b'=98 -> bin 2, 'c'=99 -> bin 3
    assert(feat.toSeq === Seq(0.0, 1.0 / 3, 1.0 / 3, 1.0 / 3, 0.0, 0.0, 0.0, 0.0))
    assert(checksum === ((97L * 131 + 98) * 131 + 99) % 1000003L)
  }

  test("hll approx distinct within 10% of exact on events") {
    // the query's own accuracy booleans must all hold (same predicate the
    // oracle asserts as literal 1), and exact counts must be positive
    val r = llm.Events.approxDistinct(spark, sf)
      .select("exact_users", "approx_within_10pct", "approx_events_within_10pct")
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(0) > 0)
      assert(row.getLong(1) === 1L, "approx_users outside 10% of exact")
      assert(row.getLong(2) === 1L, "approx_events outside 10% of exact")
    }
  }

  test("streaming watermark: late event beyond threshold is dropped, window finalizes once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toString
    val src = dir + "/in"
    def write(rows: Seq[(Long, String, Double)]): Unit =
      rows.map { case (u, ts, v) => (u, java.sql.Timestamp.valueOf(ts), v) }
        .toDF("user_id", "ts", "value")
        .write.mode("append").parquet(src)
    // batch 1: one event on day1, one on day2 late enough to close day1
    write(Seq((1L, "2024-01-01 10:00:00", 1.0), (1L, "2024-01-02 12:00:00", 2.0)))
    val q = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE").parquet(src)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("date").as("day"), col("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_wm_spec")
      .option("checkpointLocation", dir + "/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("graft_wm_spec").collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
      assert(afterB1 === Set(("2024-01-01", 1L)),
        s"day1 window must finalize once watermark passes its end: $afterB1")
      // batch 2: a LATE day1 event (behind the watermark) + an on-time day2 event
      write(Seq((1L, "2024-01-01 09:00:00", 9.9), (1L, "2024-01-02 13:00:00", 3.0)))
      q.processAllAvailable()
      val afterB2 = spark.table("graft_wm_spec").collect().map(r => (r.getDate(0).toString, r.getLong(1))).toSet
      assert(afterB2 === Set(("2024-01-01", 1L)),
        s"late day1 event must be DROPPED (no re-emit, count stays 1); day2 still open: $afterB2")
    } finally q.stop()
  }

  test("streaming file sink + checkpoint: restart resumes exactly-once, no reprocessing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (src, out, ckpt) = (dir + "/in", dir + "/out", dir + "/ckpt")
    def write(rows: Seq[(Long, Double)]): Unit =
      rows.map { case (id, v) => (id, v) }.toDF("id", "v")
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG, v DOUBLE").parquet(src)
        .select(col("id"), (col("v") * 2).as("v2"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    write(Seq((1L, 1.0), (2L, 2.0)))
    runOnce()
    assert(spark.read.parquet(out).count() === 2)
    // new input + RESTARTED query from the same checkpoint: only the new
    // batch is processed — file-sink commit log keeps output exactly-once
    write(Seq((3L, 3.0)))
    runOnce()
    val rows = spark.read.parquet(out).select("id", "v2").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows === Set((1L, 2.0), (2L, 4.0), (3L, 6.0)),
      s"restart must process only unseen input: $rows")
  }

  test("Sink.appendPartitioned: double append doubles per-partition rows, files stay clustered") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/t"
    val df = Seq(
      ("1995-01-01", "c-2", "x", 1L), ("1995-01-01", "c-1", "y", 2L),
      ("1995-01-02", "c-3", "z", 3L), ("1995-01-02", "c-0", "w", 4L),
      ("1995-01-01", "c-0", "v", 5L))
      .toDF("d", "campaign_id", "campaign_name", "v")
      .withColumn("date", to_date(col("d"))).drop("d")
    def counts() = spark.read.parquet(path).groupBy("date").count()
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    etl.Sink.appendPartitioned(df, path, "date", Seq("campaign_id", "campaign_name"))
    assert(counts() === Map("1995-01-01" -> 3L, "1995-01-02" -> 2L))
    // K-INS fidelity: a rerun APPENDS (at-least-once), it must not upsert
    etl.Sink.appendPartitioned(df, path, "date", Seq("campaign_id", "campaign_name"))
    assert(counts() === Map("1995-01-01" -> 6L, "1995-01-02" -> 4L))
    // layout: one file per append per day (repartition by partition key),
    // rows inside each file sorted by the clustering columns
    val day1 = new java.io.File(path + "/date=1995-01-01")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(day1.length === 2, "expected one file per append for the partition")
    day1.foreach { f =>
      val ids = spark.read.parquet(f.toString)
        .select("campaign_id").collect().map(_.getString(0))
      assert(ids.toSeq === ids.sorted.toSeq,
        s"within-file clustering order: ${ids.mkString(",")}")
    }
  }

  // ---- Physical-plan assertions (scale hygiene) -----------------------

  test("typed API: fb_stat round-trips through Dataset[FbAdStat] with equal totals") {
    import spark.implicits._
    val ds = queries.EtlQueries.fbStat(spark, sf).as[graft.etl.FbAdStat]
    val typedClicks = ds.map(_.clicks).reduce(_ + _)
    val untypedClicks = queries.EtlQueries.fbStat(spark, sf)
      .agg(sum("clicks")).head.getLong(0)
    assert(typedClicks === untypedClicks)
    // the encoder preserves the nested action entries
    val withActions = ds.filter(_.actions.nonEmpty).head()
    assert(withActions.actions.forall(_.action_type != null))
    assert(withActions.actions.map(_.action_type) === Seq("link_click", "page_view"))
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    // the partitioned parquet layout (not the cache) is the DPP target:
    // joining it to a filtered tiny dim must inject a dynamic pruning
    // subquery into the fact side's partition filters
    queries.EtlQueries.fbStatTable(spark, sf) // ensure written
    val fact = spark.read.parquet(graft.etl.Sink.scratchPath(sf, "fb_stat"))
    val dim = graft.etl.RatesSource.rates(spark, sf)
      .filter(month(col("date")) === 3)
    val j = fact.join(dim, Seq("date")).groupBy("currencies")
      .agg(sum("clicks").as("clicks"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning:\n${plan.take(3000)}")
    assert(j.collect().nonEmpty)
  }

  test("q_prune: single-day read plans with a partition filter") {
    val df = queries.EtlQueries.qPrune(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date"),
      s"expected partition pruning in plan:\n${plan.take(2000)}")
  }

  test("dsv2 connector: date filter prunes day-partitions inside the scan") {
    sources.FbInsightsDataSource.lastPlannedPartitions.set(-1)
    val n = queries.EtlQueries.qDsv2(spark, sf).count()
    assert(n > 0)
    val planned = sources.FbInsightsDataSource.lastPlannedPartitions.get()
    val total = new java.io.File(etl.FbInsightsSource.jsonlPath(spark, sf))
      .list().count(_.startsWith("date="))
    assert(planned > 0 && planned <= 30 && planned < total,
      s"planned $planned of $total day-partitions")
  }

  test("x_split: deterministic 80/10/10 covers every document, stable across runs") {
    val r1 = llm.Sampling.split(spark, sf).collect()
    val r2 = llm.Sampling.split(spark, sf).collect()
    assert(r1.toSeq === r2.toSeq) // content-hash split: no rand(), rerun-stable
    val splits = r1.map(_.getString(1)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    val totalDocs = r1.map(_.getLong(2)).sum
    assert(totalDocs === Tables.documents(spark, sf).count())
  }

  test("x_decontam: cross-split near-dups found; exact dups never cross") {
    val r = llm.Sampling.decontamination(spark, sf).collect()
    assert(r.nonEmpty) // the fixture plants near-dup mutations
    r.foreach { row =>
      assert(row.getString(1) !== row.getString(3))
      assert(row.getDouble(4) >= llm.Dedup.NearDupThreshold)
    }
    // exact duplicates share the content hash ⇒ always the same split
    val dupPair = Tables.documents(spark, sf)
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) >= 2).select(explode(col("ids")).as("doc_id"), col("text"))
    val sp = llm.Sampling.assignments(spark, sf)
    val nSplitsPerText = dupPair.join(sp, Seq("doc_id"))
      .groupBy("text").agg(countDistinct("split").as("ns"))
      .agg(max("ns")).head
    // sf0.001 may hold no exact-dup texts; when it does, they never split
    if (!nSplitsPerText.isNullAt(0)) assert(nSplitsPerText.getLong(0) === 1L)
  }

  test("x_lsh_recall: banding catches at least half of truly-similar pairs") {
    val r = llm.Dedup.lshRecall(spark, sf).head()
    val (nTrue, nCaught, nCand, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nCaught <= nTrue, "caught pairs must be a subset of truth")
    assert(nCaught <= nCand, "caught pairs must come from the candidate set")
    // 16 bands x 4 rows gives ~0.64 expected catch at J=0.5 and ->1 as
    // J->1; the fixture's planted near-dups sit well above threshold
    assert(recall >= 0.5, s"banding recall $recall below floor ($nCaught/$nTrue)")
  }

  test("x_scd2_join: point-in-time join conserves the fact count exactly") {
    val joined = queries.EtlQueries.qScd2Join(spark, sf)
      .agg(sum("n_orders")).head().getLong(0)
    val facts = Tables.orders(spark, sf).count()
    assert(joined === facts,
      "SCD2 intervals partition the timeline: every order binds to exactly one version")
  }

  test("q_dsv2_fn: V2 catalog function binds and equals the PolyHash kernel") {
    val rows = queries.EtlQueries.qDsv2Fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = graft.functions.PolyHashing.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)), 131L)
      assert(r.getLong(1) === expect, s"catalog fn drifted for ${r.getString(0)}")
    }
    // unknown function name through the same catalog face fails loudly
    val cat = new sources.FbInsightsCatalog
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException] {
      cat.loadFunction(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("db"), "no_such_fn"))
    }
  }

  test("x_dedup_incr: incremental pair set equals the full pair set's delta slice") {
    val full = llm.Dedup.minhashPairsTable(spark, sf)
      .filter(col("id_a") % 10 === 0 || col("id_b") % 10 === 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = llm.Dedup.dedupIncremental(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == full, "delta-only banding must reproduce the full delta slice")
  }

  test("x_sessions_dynamic: a gap that only grows never splits a fixed-gap session") {
    // dynamic gap is 30m or 60m >= the fixed 30m gap, so interval unions
    // only merge further: per-user session count must be <= the fixed one
    val dyn = llm.Events.sessionsDynamic(spark, sf)
      .select("user_id", "n_sessions").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = llm.Events.sessions(spark, sf)
      .select("user_id", "n_sessions").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dyn.keySet == fixed.keySet)
    fixed.foreach { case (u, nFixed) =>
      assert(dyn(u) <= nFixed, s"user $u: dynamic ${dyn(u)} > fixed $nFixed")
    }
  }

  test("x_token_budget: per-source kept tokens never exceed the budget") {
    val r = llm.Sampling.tokenBudget(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(1) >= 1, s"source ${row.getString(0)} kept nothing")
      assert(row.getLong(2) <= llm.Sampling.TokenBudget,
        s"source ${row.getString(0)} over budget: ${row.getLong(2)}")
    }
  }

  test("q_join_fx_asof: gap days really carry the latest earlier rate") {
    val r = queries.EtlQueries.qJoinFxAsof(spark, sf).collect()
    assert(r.nonEmpty)
    // the gate rejects day-of-month % 7 == 0, so carried rows must exist
    assert(r.map(_.getLong(2)).sum > 0, "expected carried-forward days")
    // no broadcast-nested-loop / sort on the fact side: dim-side fill only
    val plan = queries.EtlQueries.qJoinFxAsof(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast equi-join of the filled dim:\n${plan.take(3000)}")
  }

  test("x_range_join: bucketed interval join plans an equi-join, not a nested loop") {
    val df = queries.ScaleQueries.rangeJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected a bucket equi-join:\n${plan.take(3000)}")
    assert(plan.contains("bucket"), s"expected bucket join key:\n${plan.take(3000)}")
    assert(df.count() > 0)
  }

  test("x_quantiles: approx sketch lands within 1% of the exact percentile") {
    val r = llm.Events.quantiles(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getDouble(2) <= row.getDouble(3), "p50 must not exceed p90")
      assert(row.getLong(4) === 1L, "approx p50 outside 1% of range")
    }
  }

  test("AQE skew join: runtime splits the hot partition (complement of salting)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // one key carries ~20x the others — unambiguous skew. The dim is a
    // LOCAL table: OptimizeSkewedJoin only matches SMJ(Sort(Shuffle),
    // Sort(Shuffle)) — an agg between sort and shuffle disqualifies a side.
    import s2.implicits._
    val base = Tables.events(s2, sf).select("event_type", "value")
    val hot = base.filter(col("event_type") === "click")
    val fact = (1 to 20).map(_ => hot).foldLeft(base)(_ unionAll _)
    val dim = Seq(("click", 2L), ("view", 2L), ("error", 2L), ("purchase", 2L), ("signup", 2L))
      .toDF("event_type", "w")
    val j = fact.join(dim.hint("merge"), Seq("event_type"))
      .agg(sum(col("w") * col("value")).as("s"))
    assert(j.collect().head.getDouble(0) > 0)
    val finalPlan = j.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true") && finalPlan.contains("AQEShuffleRead skewed"),
      s"expected AQE to split the skewed join:\n${finalPlan.take(3000)}")
  }

  test("x_skew_join: salted shuffle join, no broadcast, salt in the exchange") {
    val df = queries.ScaleQueries.saltedJoin(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"expected a salted shuffle join, got:\n${plan.take(3000)}")
    assert(plan.contains("salt"), s"expected salt in the join exchange:\n${plan.take(3000)}")
    // salting must be value-identical to the plain join
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("weight", (length(col("event_type")) % 5 + 1).cast("long"))
    val plain = ev.join(dim, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * col("weight"))
          .cast("double").as("weighted_value"))
      .orderBy("event_type")
    assert(df.collect().toSeq === plain.collect().toSeq)
  }

  test("x_bloom_join: might_contain pre-filter below the join, value-identical to plain join") {
    val df = queries.ScaleQueries.bloomJoin(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom-filter pre-filter in the plan:\n${plan.take(3000)}")
    val ev = Tables.events(spark, sf)
    val dim = ev.filter(col("event_type") === "purchase" &&
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long") % 17 === 0)
      .select("user_id").distinct()
    val plain = ev.join(dim, "user_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("event_type")
    assert(df.collect().toSeq === plain.collect().toSeq)
  }

  test("x_scd2: intervals tile each currency's history; one current row") {
    val rows = queries.EtlQueries.qScd2(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCur = rows.groupBy(_.getString(0))
    byCur.foreach { case (_, rs) =>
      // exactly one open (current) interval, and it is the last one
      assert(rs.count(_.isNullAt(3)) === 1)
      assert(rs.last.isNullAt(3) && rs.last.getLong(4) === 1L)
      // closed intervals end strictly before the next one starts (no
      // overlap, no inversion)
      rs.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3), "only the last interval may be open")
          assert(a.getDate(3).before(b.getDate(2)),
            s"interval ${a.getDate(2)}..${a.getDate(3)} must close before ${b.getDate(2)}")
          assert(!a.getDate(2).after(a.getDate(3)), "valid_from must be <= valid_to")
        case _ => ()
      }
      // adjacent intervals must actually differ in rate (else not collapsed)
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(1) !== b.getDouble(1))
        case _ => ()
      }
    }
  }

  test("x_graph_degree: histogram mass equals twice the edge count") {
    val edges = llm.Dedup.minhashPairs(spark, sf)
      .filter(col("est_jaccard") >= llm.Dedup.NearDupThreshold)
      .count()
    val hist = llm.Graph.degrees(spark, sf).collect()
    assert(hist.nonEmpty)
    val mass = hist.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(mass === 2 * edges, s"sum(degree*n_nodes)=$mass should equal 2*|E|=${2 * edges}")
  }

  test("x_tfidf: per-source ranks are 1..K with non-increasing scores") {
    val rows = llm.TextAnalysis.tfidf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val ranks = rs.map(_.getLong(1)).toSeq
      assert(ranks === (1L to ranks.length).toSeq, s"$src ranks not contiguous")
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(5)).toSeq
      assert(scores === scores.sorted.reverse, s"$src scores not descending")
    }
  }

  test("x_pii: every 7th doc carries PII; emails and phones both detected and redacted") {
    val perSource = llm.TextAnalysis.piiStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (src, n) =>
      val r = perSource(src)
      assert(r.getLong(2) === n, s"$src: docs_with_pii should be the injected count")
      assert(r.getLong(3) === n && r.getLong(4) === n,
        s"$src: one email + one phone per injected doc")
    }
  }

  test("x_text_norm: clamp shrinks long docs only; totals consistent") {
    val rows = llm.TextAnalysis.normalizeStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val over = Tables.documents(spark, sf)
      .filter(length(col("text")) > llm.TextAnalysis.MaxDocChars)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "chars_after must not exceed chars_before")
      assert(r.getLong(2) === over.getOrElse(r.getString(0), 0L),
        s"${r.getString(0)}: only docs past the clamp should change on this corpus")
    }
  }

  test("x_pack: chunk accounting is exact — tail fill in (0, SeqLen], straddlers bounded by chunks") {
    val rows = llm.Sampling.pack(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, chunks, straddlers, tail) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(chunks === (total + llm.Sampling.SeqLen - 1) / llm.Sampling.SeqLen)
      assert(tail > 0 && tail <= llm.Sampling.SeqLen)
      assert(total === (chunks - 1) * llm.Sampling.SeqLen + tail)
      // a doc can straddle only at a chunk boundary; there are chunks-1
      assert(straddlers <= chunks - 1)
      assert(straddlers > 0, "fixture docs are shorter than SeqLen, so some must straddle")
    }
  }

  test("q_stream_dsv2: capped micro-batches through the connector; union equals the batch scan") {
    val src = etl.FbInsightsSource.jsonlPath(spark, sf)
    val work = java.nio.file.Files.createTempDirectory("graft_mb_test_")
    val stream = spark.readStream
      .format(classOf[sources.FbInsightsDataSource].getName)
      .option("path", src)
      .option("maxDaysPerBatch", 200)
      .load()
    val q = stream.writeStream.outputMode("append").format("parquet")
      .option("path", work.resolve("out").toString)
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 2,
      s"admission control should split the backlog into multiple micro-batches, got $dataBatches")
    val streamed = spark.read.parquet(work.resolve("out").toString).count()
    val batch = spark.read
      .format(classOf[sources.FbInsightsDataSource].getName)
      .option("path", src).load().count()
    assert(streamed === batch, "streamed union must equal the batch scan")
    graft.streaming.Drain.deleteRecursively(work)
  }

  test("x_kmeans: clusters partition the corpus; assignment folds map-side (no n*k shuffle)") {
    val df = llm.Similarity.kmeansAssign(spark, sf)
    val rows = df.collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "every vector assigned exactly once")
    assert(rows.length > 1, "more than one cluster should be populated")
    // the only join is the broadcast of the collapsed centroid row
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"assignment must not shuffle an n*k cross product:\n${plan.take(3000)}")
  }

  test("x_kmeans_iter: Lloyd loop partitions the corpus each iteration and converges") {
    val rows = llm.Similarity.kmeansIter(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    val byIter = rows.groupBy(_.getInt(0))
    assert(byIter.keySet === (1 to llm.Similarity.KmeansIters).toSet)
    byIter.foreach { case (it, rs) =>
      assert(rs.map(_.getLong(2)).sum === total,
        s"iteration $it must assign every vector exactly once")
    }
    // iteration 1 counts every member as newly arrived
    byIter(1).foreach(r => assert(r.getLong(5) === r.getLong(2)))
    // cluster labels are the seed vector ids, stable across iterations
    val seeds = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % llm.Similarity.CentroidStride === 0)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(1)).toSet.subsetOf(seeds))
    // the convergence metric: after the first real update step, most
    // vectors keep their cluster (seed assignment is already near-optimal)
    val moved = byIter.map { case (it, rs) => it -> rs.map(_.getLong(5)).sum }
    assert(moved(2) < moved(1), s"iteration 2 must move fewer than all $total vectors")
    // assignment folds over the one-row broadcast centroid array; the only
    // other joins key on vec_id — nothing may plan a cartesian n*k product
    val plan = llm.Similarity.kmeansIter(spark, sf).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian n*k product in the Lloyd loop:\n${plan.take(3000)}")
  }

  test("x_semdedup: per-cluster dedup profile is internally consistent") {
    val rows = llm.Similarity.semanticDedup(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "clusters partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), "cannot drop more members than exist")
      assert(r.getLong(4) === r.getLong(1) - r.getLong(3), "kept + dropped = members")
      assert(r.getLong(2) >= r.getLong(3), "every dropped id implies >= 1 pair")
    }
    // pair generation is an equi-join on cluster_id, never corpus-wide n^2
    val plan = llm.Similarity.semanticDedup(spark, sf).queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian pair join:\n${plan.take(3000)}")
  }

  test("x_bm25: top-k ranking is bounded, scored over at most the query terms") {
    val rows = llm.TextAnalysis.bm25(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= llm.TextAnalysis.Bm25TopK)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= llm.TextAnalysis.Bm25QueryTerms,
        "matched terms bounded by the query size")
      assert(r.getLong(1) >= r.getLong(2), "doc length >= distinct matched terms")
      assert(r.getDouble(3) > 0, "BM25 scores of matched docs are positive")
    }
    // the limit plans as TakeOrderedAndProject, not a global sort
    val plan = llm.TextAnalysis.bm25(spark, sf).queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be take-ordered:\n${plan.take(2000)}")
  }

  test("x_sim_knngraph: graph search is beam-bounded, recall floor met, heap-bounded plan") {
    val out = llm.Similarity.knngraphTopK(spark, sf).collect()
    assert(out.nonEmpty)
    // ranks dense 1..≤K per query; recall_hits constant per query and
    // exactly |ANN ∩ brute| (the shared grading contract)
    val bruteSets = llm.Similarity.bruteTopK(spark, sf)
      .select("qid", "cid").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    out.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"ranks not dense for qid $qid")
      assert(ranks.length <= llm.Similarity.K)
      val hits = rs.map(_.getLong(4)).distinct
      assert(hits.length === 1, s"recall_hits must be constant per query (qid=$qid)")
      assert(hits.head === rs.map(_.getLong(2)).toSet.intersect(bruteSets(qid)).size.toLong)
    }
    // accuracy contract: like LSH, the floor is graded where neighbors
    // EXIST — planted near-duplicate clusters (the uniform fixture is
    // the no-structure worst case and its honest number rides in the
    // green recall_hits column; measured ~0.57 at sf0.001, above the
    // ~0.17 of seed-hashing alone — the graph rounds complete the
    // neighborhood the buckets only sample)
    import spark.implicits._
    val r = new java.util.Random(321)
    val rows = (0 until 30).flatMap { i =>
      val base = Array.fill(64)(r.nextGaussian())
      (0 until 10).map { j =>
        val v = if (j == 0) base else base.map(_ + r.nextGaussian() * 0.15)
        (i * 10L + j, v.map(_.toFloat).toSeq)
      }
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val perQ = llm.Similarity
      .withRecall(llm.Similarity.knngraphTopKOf(clustered, 10), clustered, 10)
      .select("qid", "recall_hits").collect()
      .groupBy(_.getLong(0))
      .map { case (_, rs) => rs.head.getLong(1).toDouble / llm.Similarity.K }
    val mean = perQ.sum / perQ.size
    assert(mean >= 0.7, s"knngraph mean recall@10 on clustered corpus = $mean")
    // plan: degree bound AND beam selection run through the bounded-heap
    // TopKPerKey operator (never a corpus-wide window), no cartesian —
    // the only conditionless join is the one-row broadcast entry point
    val plan = llm.Similarity
      .knngraphTopKOf(Tables.embeddings(spark, sf), llm.Similarity.QueryStride)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TopKPerKey"), "degree/beam bounds must use the bounded heap")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n${plan.take(2000)}")
  }

  test("x_knngraph_stats: histogram partitions the corpus, degree bounded, reach consistent") {
    val rows = llm.Similarity.knngraphStats(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getLong(5)
    // the degree histogram partitions the corpus exactly
    assert(rows.map(_.getLong(1)).sum === total)
    // symmetrized out-degree is bounded by 2·KnnDegree (out ∪ reversed)
    rows.foreach(r => assert(r.getLong(0) <= 2L * llm.Similarity.KnnDegree,
      s"degree ${r.getLong(0)} exceeds the 2D closure bound"))
    // constants are constant; reciprocity is a ppm share; the entry
    // reaches at least itself and never more than the corpus
    assert(rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).distinct.length === 1)
    val (nE, recip, reach) = (rows.head.getLong(2), rows.head.getLong(3), rows.head.getLong(4))
    assert(nE > 0 && recip >= 0 && recip <= 1000000L)
    assert(reach >= 1L && reach <= total)
    // reach reconciles with an independent driver-side BFS over the
    // same collected edge list
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        llm.Similarity.norm(col("embedding")).as("nrm")).filter(col("nrm") > 0)
    val (_, _, edges) = llm.Similarity.knnEdgesOf(corpus)
    val adj = edges.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the pinned entry: smallest settled id in the shared hash order
    val entry = corpus.select("vec_id").collect().map(_.getLong(0))
      .filter(_ % 10 != 7)
      .minBy(v => ((v * llm.Similarity.CentroidHashMult)
        % llm.Similarity.CentroidHashMod, v))
    var vis = Set(entry)
    (1 to llm.Similarity.BeamRounds).foreach { _ =>
      vis = vis ++ vis.flatMap(v => adj.getOrElse(v, Set.empty))
    }
    assert(reach === vis.size.toLong,
      s"entry reach $reach disagrees with the sequential BFS ${vis.size}")
  }

  test("x_hybrid_rrf: fusion is rank-bounded, integer-exact, and sourced from both rankers") {
    val k = llm.TextAnalysis.Bm25TopK
    val rows = llm.TextAnalysis.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= k)
    // ranks dense from 1, output in rank order
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length).toSeq)
    val c0 = llm.Similarity.RrfC
    rows.foreach { r =>
      val lexR = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val denR = if (r.isNullAt(5)) None else Some(r.getLong(5))
      // per-ranker ranks bounded by the list cut
      (lexR ++ denR).foreach(x => assert(x >= 1 && x <= k))
      // n_rankers counts exactly the non-null rank columns
      assert(r.getLong(3) === (lexR.size + denR.size).toLong)
      assert(r.getLong(3) >= 1, "a fused row must come from some ranker")
      // the integer-ppm fold recomputes bit-for-bit from the ranks
      val expect = lexR.map(x => 1000000L / (c0 + x)).getOrElse(0L) +
        denR.map(x => 1000000L / (c0 + x)).getOrElse(0L)
      assert(r.getLong(2) === expect)
    }
    // fused order is (rrf_ppm DESC, doc_id) — a total order
    val key = rows.map(r => (-r.getLong(2), r.getLong(1))).toSeq
    assert(key === key.sorted)
    // the hybrid genuinely fuses: the fixture yields overlap (found-by-
    // both rows) AND rescues (rows only one ranker surfaced) — if either
    // side vanishes the operator degenerates to a single ranker
    assert(rows.exists(_.getLong(3) == 2L), "no doc found by both rankers")
    assert(rows.exists(r => !r.isNullAt(4) && r.isNullAt(5)), "no lexical-only rescue")
    assert(rows.exists(r => r.isNullAt(4) && !r.isNullAt(5)), "no dense-only rescue")
  }

  test("x_anomaly: moments cover every non-null value; the 3-sigma band is sane") {
    val rows = llm.Analytics.anomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf)
      .filter(col("value").isNotNull && !isnan(col("value"))).count()
    assert(rows.map(_.getLong(1)).sum === total, "every clean value in exactly one type")
    rows.foreach { r =>
      val (n, mean, sd, nOut) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(!sd.isNaN && sd >= 0, "variance clamp keeps sd finite")
      assert(nOut <= n, "outliers bounded by the population")
      assert(nOut < n / 2 || n < 4, s"a 3-sigma band cannot flag half the data (type=${r.getString(0)})")
      assert(!mean.isNaN)
    }
  }

  test("q_csv: CSV round-trip loses no rows; corrupt rows are captured, not dropped") {
    val rows = etl.CsvIngest.qCsv(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "every clean CSV row parses back")
    rows.foreach(r => assert(r.getLong(4) === etl.CsvIngest.CorruptLines.toLong,
      "all injected malformed lines land in _corrupt_record"))
  }

  test("q_orc: the price predicate reaches the ORC scan as a pushed filter") {
    val df = etl.OrcIngest.qOrc(spark, sf)
    assert(df.collect().nonEmpty)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.replaceAll("\\s+", " ").contains("o_totalprice"),
      s"price floor must be pushed into the ORC scan:\n${scan.take(2500)}")
  }

  test("x_chunk: stride windows are dense, bounded, and reach both document ends") {
    val chunks = llm.TextAnalysis.chunk(spark, sf).collect()
    assert(chunks.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), llm.TextAnalysis.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    chunks.groupBy(_.getLong(0)).foreach { case (docId, rs) =>
      val toks = docs(docId)
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getString(4) === toks.head, "first chunk starts the doc")
      assert(sorted.last.getString(5) === toks.last, "last chunk ends the doc")
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) === i.toLong, "chunk ids are dense")
        assert(r.getLong(2) >= 1 && r.getLong(2) <= llm.TextAnalysis.ChunkSize)
      }
      assert((sorted.length - 1) * llm.TextAnalysis.ChunkStride < toks.length,
        "no chunk starts past the document")
    }
  }

  test("x_ngram_lm: scores are probabilities; bigram counts match doc lengths") {
    val rows = llm.TextAnalysis.ngramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), size(llm.TextAnalysis.tokens(col("text"))).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (docId, m, score) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(docId % llm.TextAnalysis.LmSampleStride === 0)
      assert(m === (lens(docId) - 1).toLong, "every adjacent pair scored once")
      assert(score > 0 && score <= 1.0, s"mean P(w2|w1) must be a probability, got $score")
    }
  }

  test("x_interleave: the stream head mixes sources monotonically with weight") {
    val rows = llm.Sampling.interleave(spark, sf).collect()
    assert(rows.length === llm.Sampling.InterleaveN ||
      rows.length === Tables.documents(spark, sf).count().toInt)
    // heavier-weighted (alphabetically later) sources appear at least as
    // often in the head: count_s = floor(T * w_s) is monotone in w
    val counts = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val bySource = counts.keys.toSeq.sorted
    bySource.sliding(2).foreach {
      case Seq(a, b) => assert(counts(a) <= counts(b) + 1,
        s"weight-monotone mixing violated: $a=${counts(a)} vs $b=${counts(b)}")
      case _ =>
    }
    // within a source, ranks are consumed in order with no gaps
    rows.groupBy(_.getString(0)).foreach { case (s, rs) =>
      val ranks = rs.map(_.getLong(2)).sorted
      assert(ranks === (1L to ranks.length.toLong), s"rank gap in source $s")
    }
  }

  test("x_mad: robust scale is non-negative and bounded by the value range") {
    val rows = llm.Analytics.mad(spark, sf).collect()
    assert(rows.nonEmpty)
    val stats = Tables.events(spark, sf)
      .filter(col("value").isNotNull && !isnan(col("value")))
      .agg(min("value"), max("value")).head()
    val range = stats.getDouble(1) - stats.getDouble(0)
    rows.foreach { r =>
      val (median, mad) = (r.getDouble(2), r.getDouble(3))
      assert(mad >= 0, "MAD is a distance")
      assert(mad <= range, "MAD cannot exceed the value range")
      assert(median >= stats.getDouble(0) && median <= stats.getDouble(1),
        "median lies inside the observed range")
    }
  }

  test("x_diversity: collision probability is a probability; counts reconcile") {
    val rows = llm.TextAnalysis.charDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    val lens = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === lens(r.getLong(0)).toLong, "every character counted once")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
      val coll = r.getDouble(3)
      assert(coll >= 0.0 && coll <= 1.0, s"collision must be a probability, got $coll")
    }
  }

  test("q_sql: the SQL surface plans to the same result as the DataFrame rollup") {
    val viaSql = queries.EtlQueries.qSql(spark, sf).collect().map(_.toSeq).toSeq
    val viaDf = queries.EtlQueries.qDaily(spark, sf).collect().map(_.toSeq).toSeq
    assert(viaSql.nonEmpty)
    assert(viaSql === viaDf)
  }

  test("x_time_travel: v0 is the pre-merge state, v1 reflects exactly the merge deltas") {
    val rows = etl.Cdc.timeTravel(spark, sf).collect()
    assert(rows.length === 2)
    val (v0, v1) = (rows(0), rows(1))
    assert(v0.getLong(0) === 0L && v1.getLong(0) === 1L)
    assert(v1.getLong(1) === v0.getLong(1) + 5, "merge inserts exactly five new days")
    assert(v1.getDate(3).after(v0.getDate(3)), "inserted days extend the max date")
    assert(v0.getDate(2) === v1.getDate(2), "history before the merge is untouched")
  }

  test("x_stream_sessions_inc: cross-batch session state equals the batch sessionization") {
    val inc = llm.Events.streamingSessionsIncremental(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = llm.Events.sessions(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty)
    assert(inc === batch,
      "sessions carried across micro-batches must equal the single-pass result")
  }

  test("x_vec_avg: label partition covers the corpus; checksums bound the dim sums") {
    val rows = llm.Similarity.labelCentroids(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "every vector in exactly one label group")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5), "min_dim_sum <= max_dim_sum")
      // sum_q is between 64*min and 64*max dim sums
      assert(r.getLong(2) >= 64 * r.getLong(4) && r.getLong(2) <= 64 * r.getLong(5))
    }
  }

  test("connector write abort: a failing job leaves the table unchanged and no temp spool") {
    val dir = java.nio.file.Files.createTempDirectory("graft_abort_test_").toString
    val fmt = classOf[sources.FbInsightsDataSource].getName
    val ok = etl.FbInsightsSource.raw(spark, sf).limit(30)
    ok.write.format(fmt).option("path", dir).mode("append").save()
    val before = spark.read.format(fmt).option("path", dir).load().count()
    assert(before === 30L)
    // date_start=null violates the writer's partitioning requirement →
    // the task fails, the job aborts, and commit() never runs
    val bad = ok.withColumn("date_start",
      when(col("ad_id").isNotNull, lit(null).cast("string")))
    val failed = intercept[Exception] {
      bad.write.format(fmt).option("path", dir).mode("append").save()
    }
    assert(failed != null)
    val after = spark.read.format(fmt).option("path", dir).load().count()
    assert(after === before, "aborted job must not make any rows visible")
    val leftovers = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("_tmp-"))
    assert(leftovers.isEmpty, s"abort must drop the task spool, found: ${leftovers.mkString(",")}")
    graft.streaming.Drain.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("connector write distribution: sink-requested day clustering yields one file per date") {
    val dir = java.nio.file.Files.createTempDirectory("graft_distrib_test_").toString
    val fmt = classOf[sources.FbInsightsDataSource].getName
    // force 3 dates scattered over 8 input partitions: without the
    // sink's RequiresDistributionAndOrdering each of the 8 partitions
    // would spool its own file per date (up to 8 per date); with it,
    // Spark shuffles on date_start first and each date lands in one task
    val scattered = etl.FbInsightsSource.raw(spark, sf).limit(120)
      .withColumn("date_start",
        element_at(array(lit("2024-01-01"), lit("2024-01-02"), lit("2024-01-03")),
          (pmod(hash(col("ad_id")), lit(3)) + 1).cast("int")))
      .repartition(8)
    scattered.write.format(fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.count() === 120L)
    val dateDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
    assert(dateDirs.length === 3)
    dateDirs.foreach { d =>
      val files = d.listFiles().filter(_.isFile)
      assert(files.length === 1,
        s"${d.getName}: expected 1 clustered file, got ${files.length}")
    }
    graft.streaming.Drain.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("q_stream_sink: streaming round trip through the connector equals the batch load") {
    // loads no longer carry an output-side sort; compare as sorted rows
    val streamed = queries.EtlQueries.qStreamSink(spark, sf)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    val batch = queries.EtlQueries.qLoadFb(spark, sf)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // the sink table must be day-partitioned with no leftover spool
    val table = new java.io.File(etl.Sink.scratchPath(sf, "fb_stream_sink"), "table")
    val names = table.listFiles().map(_.getName)
    assert(names.exists(_.startsWith("date=")))
    assert(!names.exists(_.startsWith("_tmp-")), "epoch commits must sweep the spool")
  }

  test("x_latest: one row per user, struct-max agrees with a window formulation, no window in the plan") {
    val df = llm.Events.latest(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"), s"latest-per-key must not window-sort the log:\n${plan.take(2000)}")
    val rows = df.collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.length.toLong === users)
    // cross-check against the windowed formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val viaWindow = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "ts", "event_type", "value")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    rows.foreach { r =>
      assert(viaWindow(r.getLong(0)) === Seq(r.getTimestamp(2), r.getString(3), r.getDouble(4)))
    }
  }

  test("x_funnel: stage counts are monotone and order-sensitive (not mere type presence)") {
    val r = llm.Events.funnel(spark, sf).head()
    val (users, s, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users > 0 && s > 0, "fixture has signups")
    assert(users >= s && s >= c && c >= p, s"funnel must narrow: $users >= $s >= $c >= $p")
    // order-sensitivity: users with all three types present is an UPPER
    // bound that is strictly loose if any user has them out of order
    val present = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("hs"),
        max(when(col("event_type") === "click", 1).otherwise(0)).as("hc"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("hp"))
      .filter(col("hs") === 1 && col("hc") === 1 && col("hp") === 1)
      .count()
    assert(p <= present, "ordered completion can never exceed unordered presence")
  }

  test("x_cms: estimates overcount but stay deterministic across runs") {
    val r1 = llm.TextAnalysis.cmsEstimates(spark, sf).collect()
    assert(r1.length === 10)
    r1.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"${r.getString(0)}: CMS must never undercount")
      assert(r.getLong(3) === 1L)
    }
    // addition-only merge ⇒ identical sketch on a re-run, any partitioning
    val r2 = llm.TextAnalysis.cmsEstimates(spark, sf).collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
  }

  test("x_stream_daily: append-mode file sink equals batch daily") {
    val s = llm.Events.streamingDaily(spark, sf).collect()
    val b = llm.Events.daily(spark, sf).collect()
    assert(s.nonEmpty)
    assert(s.toSeq === b.toSeq)
  }

  test("x_dedup_embed: LSH candidates + exact verify, no all-pairs join") {
    val r = queries.ScaleQueries.embedDups(spark, sf)
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"expected bucket equi-join, got:\n${plan.take(2000)}")
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(got.nonEmpty)
    // every reported pair is exact-cosine-verified above the threshold
    got.foreach { case (_, _, c) =>
      assert(c >= queries.ScaleQueries.DupThreshold - 1e-6) }
    // and is a subset of the exact all-pairs baseline (test-only NLJ)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), Similarity.norm(col("embedding")).as("nrm"))
      .filter(col("nrm") > 0)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nrm").as("nb"))
    val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))
      .filter(col("cosine") >= lit(queries.ScaleQueries.DupThreshold))
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got.forall(exact.contains), "bucketed pair missing from exact baseline")
  }

  test("dsv2 write: connector append round-trips and a double append doubles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/tbl"
    val fmt = classOf[sources.FbInsightsDataSource].getName
    val raw = etl.FbInsightsSource.raw(spark, sf)
    val expected = raw.count()
    raw.write.format(fmt).option("path", dir).mode("append").save()
    assert(spark.read.format(fmt).option("path", dir).load().count() === expected)
    // at-least-once, no dedup (insert_rows_json fidelity): rerun doubles
    raw.write.format(fmt).option("path", dir).mode("append").save()
    assert(spark.read.format(fmt).option("path", dir).load().count() === 2 * expected)
    // the commit protocol cleans its temp spool and leaves only date= dirs
    val leftover = new java.io.File(dir).list().toSeq
    assert(leftover.nonEmpty && leftover.forall(_.startsWith("date=")), leftover.toString)
  }

  test("dsv2 write: round trip preserves nested arrays and absent keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_rt").toString + "/tbl"
    val fmt = classOf[sources.FbInsightsDataSource].getName
    val raw = etl.FbInsightsSource.raw(spark, sf)
    raw.write.format(fmt).option("path", dir).mode("append").save()
    val back = spark.read.format(fmt).option("path", dir).load()
    // full-row set equality after normalization (ordering-free compare)
    val a = Normalize(raw)
    val b = Normalize(back)
    assert(b.schema === a.schema)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("dsv2 agg pushdown: count-per-day plans with no Spark-side aggregate") {
    val df = queries.EtlQueries.qDsv2Agg(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"expected complete agg pushdown, got:\n${plan.take(3000)}")
    assert(plan.contains("pushedAggregation=COUNT(*)"),
      s"expected pushed COUNT(*) in scan description:\n${plan.take(3000)}")
    assert(df.count() > 0)
  }

  test("dsv2 agg pushdown: ungrouped global count stays partial but pushed") {
    val fmt = classOf[sources.FbInsightsDataSource].getName
    val path = etl.FbInsightsSource.jsonlPath(spark, sf)
    val df = spark.read.format(fmt).option("path", path).load()
      .agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggregation=COUNT(*)"),
      s"expected pushed COUNT(*):\n${plan.take(3000)}")
    val expected = etl.FbInsightsSource.raw(spark, sf).count()
    assert(df.head().getLong(0) === expected)
  }

  test("dsv2 statistics: pruned scan reports pruned bytes") {
    val path = etl.FbInsightsSource.jsonlPath(spark, sf)
    val all = sources.FbInsightsScan(path, Schemas.fbInsightsRaw, Array.empty, None)
    val start = new java.io.File(path).list()
      .filter(_.startsWith("date=")).map(_.substring(5)).min
    val oneDay = sources.FbInsightsScan(path, Schemas.fbInsightsRaw,
      Array(org.apache.spark.sql.sources.EqualTo("date_start", start)), None)
    val (bAll, bOne) =
      (all.estimateStatistics().sizeInBytes().getAsLong,
        oneDay.estimateStatistics().sizeInBytes().getAsLong)
    assert(bAll > 0 && bOne > 0 && bOne < bAll,
      s"expected pruned stats: all=$bAll oneDay=$bOne")
  }

  test("q_stream_load: streaming load equals the batch load") {
    val s = queries.EtlQueries.qStreamLoad(spark, sf).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    val b = queries.EtlQueries.qLoadFb(spark, sf).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    assert(s.nonEmpty)
    assert(s === b)
  }

  test("x_hll_merge: merged daily sketches land within 10% of exact") {
    val r = llm.Events.approxDistinctMerged(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(1) > 0)
      assert(row.getLong(2) === 1L, "merged estimate outside 10% of exact")
    }
  }

  test("dsv2 runtime filtering: a join prunes day-partitions at execution") {
    import spark.implicits._
    val fmt = classOf[sources.FbInsightsDataSource].getName
    val path = etl.FbInsightsSource.jsonlPath(spark, sf)
    val allDays = new java.io.File(path).list()
      .filter(_.startsWith("date=")).map(_.substring(5)).sorted
    val wanted = allDays.take(3)
    sources.FbInsightsDataSource.lastPlannedPartitions.set(-1)
    val fb = spark.read.format(fmt).option("path", path).load()
    // the build side must be a real source with a SELECTIVE FILTER NODE —
    // a filtered local relation gets constant-folded and stops being a
    // dynamic-pruning candidate
    val dim = Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("date_start"))
      .filter(col("date_start") <= wanted.last)
      .distinct()
    val n = fb.join(dim.hint("broadcast"), Seq("date_start")).count()
    assert(n > 0)
    val planned = sources.FbInsightsDataSource.lastPlannedPartitions.get()
    assert(planned === wanted.length,
      s"expected runtime pruning to ${wanted.length} days, planned $planned of ${allDays.length}")
  }

  test("dsv2 modes: permissive skips malformed lines, failfast raises") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badjsonl")
    val day = dir.resolve("date=2020-01-01")
    java.nio.file.Files.createDirectories(day)
    java.nio.file.Files.writeString(day.resolve("part-0.txt"),
      """{"date_start":"2020-01-01","ad_id":"a1","clicks":"1"}
        |{not json at all
        |{"date_start":"2020-01-01","ad_id":"a2","clicks":"2"}
        |""".stripMargin)
    val fmt = classOf[sources.FbInsightsDataSource].getName
    sources.FbInsightsDataSource.lastSkippedRows.set(0)
    val ok = spark.read.format(fmt).option("path", dir.toString)
      .option("mode", "permissive").load()
    assert(ok.select("ad_id").collect().map(_.getString(0)).sorted.toSeq === Seq("a1", "a2"))
    assert(sources.FbInsightsDataSource.lastSkippedRows.get() === 1L)
    // permissive also disables the blind line-count aggregate pushdown
    assert(ok.count() === 2)
    val strict = spark.read.format(fmt).option("path", dir.toString).load()
    val e = intercept[Exception] { strict.select("ad_id").collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("malformed"))))
  }

  test("dsv2 limit pushdown: scan caps parsed lines per partition") {
    val fmt = classOf[sources.FbInsightsDataSource].getName
    val path = etl.FbInsightsSource.jsonlPath(spark, sf)
    val df = spark.read.format(fmt).option("path", path).load().limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=3"), s"expected pushed limit:\n${plan.take(3000)}")
    assert(df.count() === 3)
  }

  test("dsv2 connector: filter excluding every partition plans 0, returns 0") {
    val df = spark.read
      .format(classOf[sources.FbInsightsDataSource].getName)
      .option("path", etl.FbInsightsSource.jsonlPath(spark, sf)).load()
      .filter(col("date_start") < "1900-01-01")
    assert(df.count() === 0)
    assert(sources.FbInsightsDataSource.lastPlannedPartitions.get() === 0)
  }

  test("dsv2 connector: column pruning reaches the reader schema") {
    val df = spark.read
      .format(classOf[sources.FbInsightsDataSource].getName)
      .option("path", etl.FbInsightsSource.jsonlPath(spark, sf)).load()
      .select("ad_id", "clicks")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("readSchema=ad_id,clicks"),
      s"expected pruned read schema in scan:\n$scan")
  }

  test("x_bucket_join: co-located sort-merge join, no shuffle on join keys") {
    val df = queries.ScaleQueries.bucketedJoin(spark, sf)
    df.count() // materialize through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "bucketed join should be sort-merge")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
      && !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"join keys must not be re-shuffled (bucket co-location):\n${plan.take(3000)}")
  }

  test("x_skew_salted: salted two-phase agg equals plain aggregation") {
    val salted = queries.ScaleQueries.saltedAgg(spark, sf)
      .collect().map(_.toSeq).toSeq
    val plain = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }

  test("TopKPerKey custom operator: partial+final execs, equals window result") {
    val native = queries.EtlQueries.qWindowNative(spark, sf)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n${plan.take(1500)}")
    assert(plan.split("TopKPerKey").length >= 3, "expected partial AND final TopKPerKeyExec")
    val fromWindow = queries.EtlQueries.qWindow(spark, sf)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(native.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|")) === fromWindow)
  }

  test("TopKRewrite rule: window row_number filter rewrites to TopKPerKey, equal results") {
    import org.apache.spark.sql.expressions.{Window => W}
    val daily = queries.EtlQueries.fbStatTable(spark, sf)
      .groupBy("date", "campaign_id").agg(sum("clicks").as("c"))
    val windowed = daily
      .withColumn("rn", row_number().over(
        W.partitionBy("date").orderBy(desc("c"), asc("campaign_id"))))
      .filter(col("rn") <= 3)
    val rewritten = plans.TopKRewrite.rewrite(windowed)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      s"rule did not fire; analyzed was:\n${windowed.queryExecution.analyzed.toString.take(2000)}")
    val exp = windowed.orderBy("date", "rn").collect().map(_.toSeq).toSeq
    val got = rewritten.orderBy("date", "rn").collect().map(_.toSeq).toSeq
    assert(got === exp)
  }

  test("TopKRewrite rule: leaves non-matching filters untouched") {
    val df = Tables.documents(spark, sf).filter(col("n_chars") <= 3000)
    val out = plans.TopKRewrite.rewrite(df)
    assert(out.collect().length === df.collect().length)
  }

  test("q_join_fx: rates side is broadcast, no shuffle join") {
    val df = queries.EtlQueries.qJoinFx(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "FX join should broadcast the rates side")
  }

  test("x_stream_dedup: double-delivered stream dedups to the single-copy aggregate") {
    val deduped = llm.StreamingOps.streamingDedup(spark, sf).collect().map(_.toSeq).toSeq
    val single = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(deduped === single)
  }

  test("X-STREAM-NEARDUP: ingest-time banding equals the batch incremental formulation") {
    // batch ≡ stream: the 4-chunk foreachBatch replay against the
    // persisted band index must reproduce x_dedup_incr's pair set and
    // estimates ROW FOR ROW (same contract as x_stream_daily vs q_daily)
    val stream = llm.StreamingOps.streamingNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val batch = llm.Dedup.dedupIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(stream.nonEmpty, "the fixture plants delta-touching near-dup pairs")
    assert(stream === batch)
    // every pair touches the delta — the ingest-side contract
    stream.foreach { case (a, b, _) =>
      assert(a % 10 == 0 || b % 10 == 0, s"pair ($a,$b) touches no delta doc")
    }
  }

  test("X-STREAM-NEARDUP: per-batch probe broadcasts the batch side, never shuffles the index") {
    // the scaladoc claims cost-per-batch ∝ batch size because the
    // persisted band index / signature tables are probed via broadcast
    // joins — pin that as the PLAN, not the estimator's choice: the
    // per-batch pair computation must contain only BroadcastHashJoins,
    // and no exchange may repartition the persisted tables
    val root = llm.StreamingOps.nearDupStaging(spark, sf)
    val batch = spark.read.parquet(root.resolve("chunks").toString + "/chunk0.parquet")
    val plan = llm.StreamingOps.nearDupBatchPairs(
      llm.StreamingOps.nearDupBatchSigs(batch),
      spark.read.parquet(root.resolve("bands").toString),
      spark.read.parquet(root.resolve("sigs").toString))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"persisted index must not be shuffled per micro-batch:\n$plan")
  }

  test("X-STREAM-SIM: micro-batch index ingest serves the batch incremental answer") {
    // batch ≡ stream: 4 micro-batches of delta vectors assigned against
    // the frozen persisted centroid model and appended to the inverted
    // file must serve EXACTLY x_sim_incr's merged top-k (same proof
    // structure as X-STREAM-NEARDUP vs x_dedup_incr)
    val stream = llm.StreamingOps.streamingSimIngest(spark, sf).collect()
      .map(_.toSeq).toSeq
    val batch = llm.Similarity.simIncrTopK(spark, sf).collect()
      .map(_.toSeq).toSeq
    assert(stream.nonEmpty)
    assert(stream === batch)
    // the ingest genuinely lands in the serving set: some query sees a
    // delta vector among its top-k (the freshness the ingest exists for)
    assert(stream.exists(r => r(4).asInstanceOf[Long] > 0L),
      "no query served a freshly ingested vector — the fixture plants some")
  }

  test("X-STREAM-ANN-DELETE: no victim serves mid-stream; batch ≡ stream; compaction drops the log") {
    import graft.queries.AnnServe
    // batch ≡ stream: the streamed tombstone serve must equal the
    // copy-on-write purge's answer ROW FOR ROW (same oracle)
    val stream = llm.StreamingOps.streamingAnnDelete(spark, sf).collect().map(_.toSeq).toSeq
    val cow = AnnServe.deleteServe(spark, sf).collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty && stream === cow)
    // mid-stream: replay the chunks one batch at a time against a
    // spec-managed tombstone log; after EACH batch, no id tombstoned so
    // far may appear among the served cids — deletion takes effect at
    // the batch commit, not at compaction
    val root = llm.StreamingOps.annDeleteStaging(spark, sf)
    val work = java.nio.file.Files.createTempDirectory("graft_spec_sdel_")
    val tombDir = work.resolve("tombstones").toString
    val allVictims = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(AnnServe.DeleteMod)) === AnnServe.DeleteRem)
      .collect().map(_.getLong(0)).toSet
    var seen = Set.empty[Long]
    var sawPartial = false
    (0 until 4).foreach { i =>
      val batch = spark.read.parquet(root.resolve("chunks").toString + s"/chunk$i.parquet")
      batch.select("vec_id").write.mode("append").parquet(tombDir)
      seen ++= batch.collect().map(_.getLong(0))
      val served = AnnServe.tombstoneServe(spark, sf, tombDir).collect()
        .map(_.getLong(2)).toSet
      assert(served.intersect(seen).isEmpty,
        s"batch $i: tombstoned ids still serving: ${served.intersect(seen)}")
      // not-yet-tombstoned victims MUST still serve mid-stream (the
      // serve obeys the LOG, not the victim rule) — witnessed on at
      // least one partial prefix
      if (i < 3 && served.intersect(allVictims -- seen).nonEmpty) sawPartial = true
    }
    assert(seen === allVictims, "the chunk replay must deliver every victim exactly")
    assert(sawPartial,
      "no future victim ever served mid-stream — the fixture should exercise the partial state")
    // compaction: fold the log into a COPY of the live index staging —
    // victims purged cell-locally, zero tombstones remain, the log is gone
    val live = java.nio.file.Paths.get(
      graft.etl.Sink.scratchPath(sf, "ann_warehouse"), "staging", "pq_index")
    val copy = work.resolve("pq_index_copy")
    def copyRec(s: java.nio.file.Path, d: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(s).iterator().asScala.foreach { p =>
        val t = d.resolve(s.relativize(p).toString)
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    }
    copyRec(live, copy)
    val before = spark.read.json(copy.toString)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    val (total, rewritten) = AnnServe.applyTombstones(spark, copy.toString, tombDir)
    assert(rewritten > 0 && rewritten <= total)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tombDir)),
      "compaction must drop the tombstone log")
    val after = spark.read.json(copy.toString)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(after === before -- seen,
      "compaction must purge exactly the tombstoned postings")
    // idempotence: folding an empty log is a no-op rewrite of nothing
    val emptyTomb = work.resolve("tomb_empty").toString
    spark.range(0).select(col("id").as("vec_id")).write.parquet(emptyTomb)
    val (t2, r2) = AnnServe.applyTombstones(spark, copy.toString, emptyTomb)
    assert(r2 === 0 && t2 > 0)
    graft.streaming.Drain.cleanupAtExit(work)
  }

  test("x_contrastive: triplets straddle the threshold and both sides are argmax-optimal") {
    val t = llm.Dedup.NearDupThreshold
    val out = llm.Dedup.contrastivePairs(spark, sf).collect()
    assert(out.nonEmpty, "the fixture plants pairs on both sides of the threshold")
    val sym = llm.Dedup.minhashPairsTable(spark, sf).collect()
      .flatMap(r => Seq(
        (r.getLong(0), r.getLong(1), r.getDouble(2)),
        (r.getLong(1), r.getLong(0), r.getDouble(2))))
      .groupBy(_._1)
    out.foreach { r =>
      val (a, p, pj, n, nj) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(pj >= t && nj < t, s"triplet for $a does not straddle the threshold")
      assert(p != a && n != a && p != n)
      val partners = sym(a)
      // the positive is the best verified near-dup, the negative the
      // best banding near miss — (max est, min partner) on each side
      val bestPos = partners.filter(_._3 >= t).minBy(x => (-x._3, x._2))
      val bestNeg = partners.filter(_._3 < t).minBy(x => (-x._3, x._2))
      assert((p, pj) === (bestPos._2, bestPos._3))
      assert((n, nj) === (bestNeg._2, bestNeg._3))
    }
    // completeness: every anchor with BOTH sides present emits exactly once
    val expected = sym.filter { case (_, ps) =>
      ps.exists(_._3 >= t) && ps.exists(_._3 < t) }.keySet
    assert(out.map(_.getLong(0)).toSet === expected)
    assert(out.length === expected.size)
  }

  test("x_clean_split: evicts exactly the test-contaminated train/val docs") {
    val rows = llm.Sampling.cleanSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    // totals agree with the plain split audit (eviction only annotates)
    val plain = llm.Sampling.split(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert((r.getLong(2), r.getLong(3)) === plain(k))
    }
    // test rows are never evicted; some train/val eviction happens at the
    // fixture (the decontam spec plants cross-split near-dups)
    rows.filter(_.getString(1) == "test").foreach(r => assert(r.getLong(4) === 0L))
    assert(rows.filter(_.getString(1) != "test").map(_.getLong(4)).sum > 0L,
      "fixture plants cross-split near-dups to evict")
    // the eviction set is exactly the non-test side of x_decontam's
    // test-touching leak pairs
    val leaks = llm.Sampling.decontamination(spark, sf).collect()
    val expected = leaks.flatMap { l =>
      val (a, sa, b, sb) = (l.getLong(0), l.getString(1), l.getLong(2), l.getString(3))
      Seq((a, sa, sb), (b, sb, sa))
    }.filter { case (_, s, o) => s != "test" && o == "test" }.map(_._1).toSet
    val sp = llm.Sampling.assignments(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docIds = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val evictedSum = rows.filter(_.getString(1) != "test").map(_.getLong(6)).sum
    assert(evictedSum === expected.toSeq.sum,
      "evicted-id checksums must equal the decontam-derived eviction set")
    val evictedCount = rows.map(_.getLong(4)).sum
    assert(evictedCount === expected.size)
    assert(expected.forall(id => sp(id) != "test") && docIds.nonEmpty)
  }

  test("q_roas: exact money math and conversion reconciliation") {
    val rows = queries.EtlQueries.qRoas(spark, sf).collect()
    assert(rows.nonEmpty)
    // every conversion in the fact lands in exactly one campaign row
    val nConvTotal = queries.EtlQueries.fbStatTable(spark, sf)
      .select(size(col("conversions")).cast("long").as("n")).collect()
      .map(_.getLong(0)).sum
    assert(rows.map(_.getLong(3)).sum === nConvTotal)
    rows.foreach { r =>
      val spend = r.getDouble(1)
      val conv = r.getLong(2)
      val cpv = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(spend > 0)
      // spend is scale-4 exact, so ×10⁴ is an exact integer and the
      // cost-per-value integer division recomputes bit-for-bit
      if (conv > 0) assert(cpv === Some(Math.round(spend * 10000) / conv))
      else assert(cpv.isEmpty, "no conversions must report null cost")
    }
  }

  test("x_sim_filtered_pq: label filter reaches the quantized index scan") {
    sources.AnnIndexTable.lastPlannedCells.set(-1)
    sources.AnnIndexTable.drainPushedRowFilters() // clear other tests' scans
    val out = graft.queries.AnnServe.filteredPqServe(spark, sf).collect()
    assert(out.nonEmpty)
    // cell pruning bounded by the probe budget AND the label pushed as a
    // row filter — non-matching postings never reconstruct, never score
    val planned = sources.AnnIndexTable.lastPlannedCells.get()
    val nq = out.map(_.getLong(0)).distinct.length
    assert(planned > 0 && planned <= nq * llm.Similarity.NumProbes)
    val scans = sources.AnnIndexTable.drainPushedRowFilters()
    assert(scans.nonEmpty && scans.forall(_.contains("label")),
      s"every quantized index scan must carry the pushed label filter: $scans")
    // every served cid carries the filter label; ranks dense per query
    val lab = graft.queries.AnnServe.FilterLabel
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(labels(r.getLong(2)) === lab))
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length))
    }
    // the filtered shortlist is exactly the label-class rows of the
    // unfiltered ADC candidate order, re-ranked (same probes, same ADC
    // scores) — the prefix law's quantized sibling, bounded by PqRerank
    val unfiltered = graft.queries.AnnServe.pqServe(spark, sf).collect()
    out.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val unf = unfiltered.filter(_.getLong(0) == qid).sortBy(_.getLong(1))
        .map(_.getLong(2)).filter(labels(_) == lab)
      val got = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      // the unfiltered list's label-class members must appear as a prefix
      // of the filtered list in the same order (the filtered probe can
      // additionally surface label rows the PqRerank cutoff dropped)
      assert(got.take(unf.length).sameElements(unf),
        s"qid $qid: filtered list does not extend the unfiltered label rows")
    }
  }

  test("x_ann_delete: victims purged cell-locally, idempotent, and never served") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_delete")
      .toString + "/idx"
    llm.Similarity.pqIndexFrame(Tables.embeddings(spark, sf))
      .write.mode("overwrite").partitionBy("cent_id").json(dir)
    val mod = graft.queries.AnnServe.DeleteMod
    val rem = graft.queries.AnnServe.DeleteRem
    def rows(): Set[(Long, Long)] = spark.read.json(dir)
      .select(col("vec_id").cast("long"), col("cent_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def snapshot(): Map[String, Seq[(String, String)]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(d => d.isDirectory && d.getName.startsWith("cent_id="))
        .map { d =>
          d.getName -> d.listFiles().filter(f => f.getName.startsWith("part-"))
            .sortBy(_.getName).toSeq.map { f =>
              val md = java.security.MessageDigest.getInstance("MD5")
                .digest(java.nio.file.Files.readAllBytes(f.toPath))
              (f.getName, md.map("%02x".format(_)).mkString)
            }
        }.toMap
    }
    val before = rows()
    val victims = before.filter(_._1 % mod == rem)
    assert(victims.nonEmpty, "the fixture plants deletable postings")
    val untouchedBefore = snapshot().filter { case (d, _) =>
      !victims.exists(v => d == s"cent_id=${v._2}") }
    val (_, rewritten) = graft.queries.AnnServe.deleteFromIndex(spark, dir)
    assert(rewritten === victims.map(_._2).size,
      "exactly the victim-bearing cells are rewritten")
    // exact survivor set, purge is cell-local
    assert(rows() === before -- victims)
    // cells without a victim are byte-identical — the CoW rewrite never
    // touched them
    untouchedBefore.foreach { case (d, files) =>
      assert(snapshot()(d) === files, s"untouched cell $d was rewritten")
    }
    // idempotence: a second purge finds nothing, rewrites nothing, and
    // leaves EVERY cell byte-identical
    val full = snapshot()
    val (_, again) = graft.queries.AnnServe.deleteFromIndex(spark, dir)
    assert(again === 0)
    assert(snapshot() === full)
    // the served probe never returns a victim and stays densely ranked
    val out = graft.queries.AnnServe.deleteServe(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(2) % mod != rem,
      s"victim ${r.getLong(2)} still serving"))
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length))
    }
  }

  test("x_ann_rebalance: splits partition their parents and the max cell never grows") {
    val out = llm.Similarity.annRebalance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val stats = llm.Similarity.annStats(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // postings conserved, globally and per parent
    assert(out.map(_._3).sum === stats.values.map(_._1).sum)
    out.groupBy(_._2).foreach { case (parent, children) =>
      assert(children.map(_._3).sum === stats(parent)._1,
        s"children of $parent do not partition its postings")
      assert(children.map(_._4).sum === stats(parent)._2,
        s"children of $parent do not carry its exact members")
    }
    // the above-mean rule fired (the fixture is near-uniform, so some
    // cells sit above the mean) and every split parent got >1 child;
    // unsplit cells pass through with their own id
    val split = out.filter(r => r._1 != r._2)
    assert(split.nonEmpty, "no cell split — the above-mean rule must fire")
    split.groupBy(_._2).foreach { case (p, ch) =>
      assert(ch.length > 1 || out.count(_._2 == p) > 1,
        s"split parent $p produced a single child")
    }
    out.filter(r => out.count(_._2 == r._2) == 1).foreach(r =>
      assert(r._1 === r._2, "an unsplit cell must keep its id"))
    // rebalance never increases the maximum cell size
    assert(out.map(_._3).max <= stats.values.map(_._1).max)
  }

  test("x_ann_stats: shares total a partition, imbalance is max/mean, assignment checks out") {
    val rows = llm.Similarity.annStats(spark, sf).collect()
    val nCells = rows.length
    assert(nCells > 1, "the fixture has multiple centroids")
    val total = rows.map(_.getLong(1)).sum
    // counts partition the corpus (every norm>0 vector in exactly one cell)
    val corpus = Tables.embeddings(spark, sf)
      .filter(llm.Similarity.norm(col("embedding")) > 0).count()
    assert(total === corpus)
    val maxN = rows.map(_.getLong(1)).max
    rows.foreach { r =>
      assert(r.getLong(3) === r.getLong(1) * 1000000L / total)
      assert(r.getLong(4) === maxN * nCells * 1000000L / total)
    }
    // imbalance ≥ 1e6 by construction (max ≥ mean), equality iff uniform
    assert(rows.head.getLong(4) >= 1000000L)
  }

  test("x_curriculum: stages are equal-count quartiles per source and budgets reconcile") {
    val rows = llm.TextAnalysis.curriculum(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val st = llm.TextAnalysis.CurriculumStages
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to st),
        s"source $src must emit all $st stages")
      assert(rs.map(_.getLong(2)).sum === perSource(src),
        s"stage doc counts must partition source $src")
      // ntile: earlier stages are never smaller, and differ by at most 1
      val sizes = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b && a - b <= 1 })
      // curriculum order: stage 1's worst score is >= stage s's best for s>1
      val byStage = rs.map(r => r.getLong(1) -> (r.getLong(4), r.getLong(5))).toMap
      (1 until st).foreach { s =>
        assert(byStage(s.toLong)._2 >= byStage(s.toLong + 1)._1,
          s"stage $s of $src overlaps stage ${s + 1} out of order")
      }
    }
    // token budgets reconcile with the corpus total
    val totalTokens = docs
      .select(size(llm.TextAnalysis.tokens(col("text"))).cast("long").as("n")).collect()
      .map(_.getLong(0)).sum
    assert(rows.map(_.getLong(3)).sum === totalTokens)
  }

  test("X-STREAM-MM: micro-batch payload digesting lands on the batch manifest") {
    // batch ≡ stream: 4 micro-batches digested in foreachBatch, rolled up
    // from the 16-byte digest log, must reproduce x_mm_dedup's manifest
    val stream = llm.StreamingOps.streamingMediaIngest(spark, sf).collect()
      .map(_.toSeq).map(s => (s(0), s(1), s(2), s(3), s(4))).sortBy(_._1.toString)
    val batch = llm.Multimodal.payloadDedup(spark, sf).collect()
      .map(_.toSeq).map(s => (s(0), s(1), s(2), s(3), s(4))).sortBy(_._1.toString)
    assert(stream.nonEmpty)
    assert(stream === batch)
  }

  test("x_stream_join: stream-stream range join equals the batch range join") {
    val streamed = llm.StreamingOps.streamingJoin(spark, sf).collect().map(_.toSeq).toSeq
    val ev = Tables.events(spark, sf)
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
    val batch = p.join(s,
        col("p_user") === col("s_user") &&
          col("purchase_ts") >= col("signup_ts") &&
          col("purchase_ts") <= col("signup_ts") + expr("interval 7 days"))
      .groupBy(col("purchase_ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_attributed"),
        countDistinct("p_user").as("n_users"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("attributed_value"))
      .orderBy("day").collect().map(_.toSeq).toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("x_connected: components partition the edge set; labels are component minima") {
    val edges = llm.Dedup.minhashPairs(spark, sf)
      .filter(col("est_jaccard") >= llm.Dedup.NearDupThreshold)
      .select("id_a", "id_b")
    val labels = llm.Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(es.nonEmpty)
    // every edge endpoint is labeled, both endpoints agree, and the
    // component label is one of its members (the minimum)
    es.foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b))
      assert(labels(a) === labels(b), s"edge ($a,$b) split across components")
    }
    labels.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.keySet.min === comp, s"component $comp label is not its min member")
    }
  }

  test("x_shortest_path: BFS distances on a known topology; cap overrun throws") {
    import spark.implicits._
    // chain 0-1-2-3-4 plus isolated pair (10,11); seed = node 0 only
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val d = llm.Graph.shortestPathsOf(edges, col("id") === 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      "chain distances must be exact hops; the unreached pair must be absent")
    // multi-source: nearest seed wins
    val d2 = llm.Graph.shortestPathsOf(edges, col("id") === 0L || col("id") === 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2 === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
    // a round cap below the eccentricity must throw, never truncate
    val e = intercept[IllegalStateException] {
      llm.Graph.shortestPathsOf(edges, col("id") === 0L, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // fixture query: histogram is non-empty and dist 0 rows are the seeds
    val hist = graft.SparkEntry.queries("x_shortest_path")(spark, sf).collect()
    assert(hist.nonEmpty)
    val d0 = hist.find(_.getLong(0) == 0L)
    assert(d0.isDefined, "seed rows (dist 0) must exist in the fixture graph")
  }

  test("connectedComponents: pointer jumping closes a long chain in O(log d) rounds; cap overrun throws") {
    import spark.implicits._
    // a 201-node chain (diameter 200): plain min-propagation needs 200
    // rounds; pointer jumping squares the reach per round → ~10 suffice
    val chain = (0L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = llm.Graph.connectedComponents(chain, maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 201)
    assert(labels.values.forall(_ == 0L), "every chain node must fold to component 0")
    // non-convergence must be a visible failure, never silently wrong labels
    val e = intercept[IllegalStateException] {
      llm.Graph.connectedComponents(chain, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("q_compact: month layout cuts file count by the compaction ratio") {
    queries.EtlQueries.qCompact(spark, sf).count() // ensure both layouts exist
    def parquetFiles(root: String): Int = {
      val b = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try b.filter(p => p.toString.endsWith(".parquet")).count().toInt finally b.close()
    }
    val before = parquetFiles(etl.Sink.scratchPath(sf, "fb_stat"))
    val after = parquetFiles(etl.Sink.scratchPath(sf, "fb_stat_monthly"))
    assert(after > 0)
    assert(before >= after * 10,
      s"expected >=10x fewer files, got $before -> $after")
  }

  test("q_merge: five inserts, %3 days updated with +0.5, keeps untouched") {
    val rows = queries.EtlQueries.qMerge(spark, sf).collect()
    val byAction = rows.groupBy(_.getString(3))
    assert(byAction("insert").length === 5)
    val base = etl.RatesSource.rates(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(2)).toMap
    byAction("update").foreach { r =>
      assert(r.getDouble(2) === base(r.getDate(0).toString) + 0.5) }
    byAction("keep").foreach { r =>
      assert(r.getDouble(2) === base(r.getDate(0).toString)) }
    assert(byAction("update").nonEmpty && byAction("keep").nonEmpty)
  }

  test("x_window_range: trailing 7-day frame equals a brute-force range self-join") {
    val got = llm.Events.rangeWindow(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2))).toSeq
    val daily = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val l = daily.select(col("user_id"), col("day"))
    val r = daily.select(col("user_id").as("u2"), col("day").as("d2"), col("n"))
    val brute = l.join(r,
        col("user_id") === col("u2") &&
          col("d2") >= date_sub(col("day"), 6) && col("d2") <= col("day"))
      .groupBy("user_id", "day").agg(sum("n").as("n7"))
      .collect().map(x => (x.getLong(0), x.getDate(1).toString, x.getLong(2))).toSeq
    assert(got.sorted === brute.sorted)
  }

  test("x_zorder: per-file (day,user) bounding boxes are small fractions of the domain") {
    queries.ScaleQueries.zorderQuery(spark, sf).count() // ensure layout
    val dst = etl.Sink.scratchPath(sf, "events_zorder")
    val files = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.length >= 8)
    val all = spark.read.parquet(dst)
    val g = all.agg(
      (datediff(max("day"), min("day")) + 1).as("dspan"),
      (max("user_id") - min("user_id") + 1).as("uspan")).head()
    val area = g.getInt(0).toLong * g.getLong(1)
    val boxes = files.map { f =>
      val b = spark.read.parquet(f).agg(
        (datediff(max("day"), min("day")) + 1).as("d"),
        (max("user_id") - min("user_id") + 1).as("u")).head()
      b.getInt(0).toLong * b.getLong(1)
    }
    val mean = boxes.sum.toDouble / boxes.length
    assert(mean <= area / 4.0,
      s"z-order files should cluster both dims: mean box $mean vs domain $area")
  }

  test("x_heavy_hitters: top-10 clear the N/capacity bound; sketch bounded and overcounting") {
    import org.apache.spark.sql.Encoders
    val toks = Tables.documents(spark, sf)
      .select(explode(llm.TextAnalysis.tokens(col("text"))).as("token"))
    val n = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // precondition that makes the in_sketch flag deterministic: every
    // true top-10 token's count exceeds N/capacity
    val top10 = exact.toSeq.sortBy { case (t, f) => (-f, t) }.take(10)
    top10.foreach { case (t, f) =>
      assert(f > n / graft.functions.HeavyHitters.Capacity,
        s"fixture precondition broken: $t has $f <= N/cap") }
    val sketch = toks.select(
        udaf(graft.functions.HeavyHitters.spaceSaving, Encoders.STRING)
          .apply(col("token")).as("s"))
      .head().getMap[String, Long](0)
    assert(sketch.size <= graft.functions.HeavyHitters.Capacity)
    // SpaceSaving invariant: every stored estimate overcounts
    sketch.foreach { case (t, est) => assert(est >= exact(t), s"undercount on $t") }
    // and the guaranteed-present flag is 1 for the whole exact top-10
    val flags = llm.TextAnalysis.heavyHitters(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(flags.size === 10)
    assert(flags.values.forall(_ == 1L))
  }

  test("x_stream_upsert: foreachBatch CoW snapshots converge to the batch merge") {
    val streamed = etl.Cdc.streamUpsert(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = queries.EtlQueries.qMerge(spark, sf)
      .select("date", "currencies", "rate")
      .collect().map(_.toSeq).toSeq
    assert(streamed === batch)
  }

  test("q_delete: victim gone, only z-files containing the victim were rewritten") {
    val out = etl.Cdc.delete(spark, sf)
    out.count() // ensure the deleted layout exists
    val dst = etl.Sink.scratchPath(sf, "events_zorder_deleted")
    val entries = new java.io.File(dst).listFiles()
    // untouched source files carry over as top-level copies; rewritten
    // ones land inside the single rw_batch output dir
    val untouched = entries.count(e =>
      e.getName.endsWith(".parquet") && !e.getName.startsWith("rw_"))
    val srcFiles = new java.io.File(graft.queries.ScaleQueries.zorderLayout(spark, sf))
      .listFiles().count(_.getName.endsWith(".parquet"))
    val affected = srcFiles - untouched
    assert(affected >= 1, "at least one file must contain the victim")
    assert(untouched > affected,
      s"z-order should confine the victim to a minority of files: $affected rewritten vs $untouched untouched")
    val remaining = spark.read.option("recursiveFileLookup", "true").parquet(dst)
    val victim = Tables.events(spark, sf).agg(min("user_id")).head().getLong(0) + 3
    assert(remaining.filter(col("user_id") === victim).count() === 0)
  }

  test("q_delete rewrite: Spark job count independent of affected-file count (≤2)") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_delete_jobs_")
    val srcDir = work.resolve("src").toString
    val dstDir = work.resolve("dst").toString
    Files.createDirectories(java.nio.file.Paths.get(dstDir))
    // a victim smeared over MANY files — the case the old per-file loop
    // serialized into one Spark job per file
    Tables.events(spark, sf).repartition(8).write.parquet(srcDir)
    val victim = Tables.events(spark, sf).agg(min("user_id")).head().getLong(0)
    val files = new java.io.File(srcDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    val affected = files.filter(f =>
      spark.read.parquet(f).filter(col("user_id") === victim).head(1).nonEmpty).toSet
    assert(affected.size >= 3, s"fixture must smear the victim (got ${affected.size} files)")
    spark.sparkContext.setJobGroup("graft-rewrite-audit", "rewrite job count audit")
    try etl.Cdc.rewriteAffected(spark, files, affected, victim, dstDir)
    finally spark.sparkContext.clearJobGroup()
    // the status store is fed asynchronously; poll until it stabilizes
    def groupJobs() = spark.sparkContext.statusTracker
      .getJobIdsForGroup("graft-rewrite-audit").length
    val deadline = System.nanoTime() + 10e9.toLong
    var n = groupJobs()
    while (System.nanoTime() < deadline && { Thread.sleep(100); groupJobs() != n })
      n = groupJobs()
    assert(n >= 1 && n <= 2,
      s"rewrite of ${affected.size} affected files must be ≤2 jobs, got $n")
    // and the rewrite is still value-exact: victim gone, everything else kept
    val remaining = spark.read.option("recursiveFileLookup", "true").parquet(dstDir)
    assert(remaining.filter(col("user_id") === victim).count() === 0)
    val expect = Tables.events(spark, sf).filter(col("user_id") =!= victim).count()
    assert(remaining.count() === expect)
  }

  test("catalog: external LOCATION tables survive into a fresh catalog instance") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_catalog_durable_")
    val wh = work.resolve("wh").toString
    val external = work.resolve("ext_data").toString
    // first catalog instance: CREATE ... LOCATION through SQL DDL
    val cat = "fbdur_" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.FbInsightsCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE TABLE $cat.db.ext USING fbinsights LOCATION '$external'")
    etl.FbInsightsSource.raw(spark, sf).limit(7).createOrReplaceTempView("cat_dur_src")
    spark.sql(s"INSERT INTO $cat.db.ext SELECT * FROM cat_dur_src")
    // a FRESH catalog instance over the same warehouse — the in-JVM map is
    // empty; only the durable _locations.properties can resolve the table
    val fresh = new graft.sources.FbInsightsCatalog
    fresh.initialize("fresh", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "ext")
    assert(fresh.tableExists(ident), "fresh instance must resolve the external table")
    // and through a fresh SQL-registered catalog: SELECT succeeds with data
    val cat2 = "fbdur2_" + System.nanoTime()
    spark.conf.set(s"spark.sql.catalog.$cat2",
      classOf[graft.sources.FbInsightsCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat2.warehouse", wh)
    assert(spark.sql(s"SELECT * FROM $cat2.db.ext").count() === 7L)
    assert(spark.sql(s"SHOW TABLES IN $cat2.db").collect()
      .map(_.getString(1)).contains("ext"), "external table must be listed")
    // registry entry removed with the table
    val d = new graft.sources.FbInsightsCatalog
    d.initialize("d", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    d.dropTable(ident)
    val postDrop = new graft.sources.FbInsightsCatalog
    postDrop.initialize("pd", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    assert(!postDrop.tableExists(ident), "dropped external table must not resurrect")
  }

  test("q_evolve: old-epoch rows surface the added column as NULL; scan stays pruned") {
    val df = etl.SchemaEvolve.qEvolve(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).contains("legacy"), "epoch1 rows must appear as legacy")
    assert(rows.length === 4, "web/store/app/legacy")
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "no row lost across epochs")
    // column pruning survives footer merging: the scan must not read the
    // untouched columns (o_orderstatus never referenced)
    val scan = df.queryExecution.executedPlan.toString
    assert(!scan.contains("o_orderstatus"),
      s"merged-schema scan must stay pruned:\n${scan.take(2000)}")
    // the pitfall pinned: WITHOUT mergeSchema Spark trusts one footer —
    // if it picks an epoch1 file the evolved column silently vanishes;
    // reading epoch1 alone proves the old files truly lack the column
    val dir = etl.SchemaEvolve.evolvePath(spark, sf)
    val old = spark.read.parquet(s"$dir/epoch1")
    assert(!old.columns.contains("channel"), "epoch1 predates the column")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/epoch1", s"$dir/epoch2")
    assert(merged.columns.contains("channel"))
    assert(merged.filter(col("channel").isNull).count() ===
      Tables.orders(spark, sf).filter(col("o_orderkey") % 2 === 0).count())
  }

  test("x_embed_quant: bounded reconstruction error, full coverage, map-only quantize") {
    val df = llm.Quantize.embedQuant(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "every vector quantized exactly once")
    rows.foreach { r =>
      // affine int8 over [mn, mx]: error is bounded by half a step of the
      // widest dimension — for N(0,1)-ish floats that is well under 0.05
      assert(r.getDouble(5) < 0.05, s"worst_err ${r.getDouble(5)} too large")
      assert(r.getLong(4) >= 2, "per-dim min and max rows saturate by construction")
    }
    // scale shape: the quantize pass is map-only — no shuffle between the
    // broadcast of the calibration row and the per-label aggregate's own
    // partial agg (one Exchange total, for the final groupBy(label))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      s"calibration must broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("hashpartitioning(vec_id"),
      "the corpus must not be shuffled to quantize")
  }

  test("x_profile: one row per column; injected nulls counted exactly; keys identified") {
    val rows = llm.Profile.profile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val total = Tables.events(spark, sf).count()
    assert(rows.size === 6)
    rows.values.foreach { case (n, _, _) => assert(n === total) }
    val expValueNulls = Tables.events(spark, sf)
      .filter(col("event_id") % 17 === 0).count()
    assert(rows("value")._2 === expValueNulls, "injected null pattern counted exactly")
    assert(rows("event_id")._2 === 0L)
    // distincts identify the key vs the enum
    assert(rows("event_id")._3 === total, "event_id is the unique key")
    assert(rows("event_type")._3 === 5L, "event_type is a small enum")
  }

  test("x_optout: anti/semi split is exact, list is broadcast, fact never shuffled to filter") {
    val df = etl.OptOut.optOut(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === total,
      "kept + suppressed must partition the fact table")
    assert(rows.map(_.getLong(2)).sum > 0, "the suppression list must bite")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("LeftSemi"),
      s"both governance verbs must appear:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      "the suppression list must broadcast")
    assert(!plan.contains("hashpartitioning(o_custkey"),
      "the fact table must not shuffle to be filtered")
  }

  test("x_boilerplate: presence-based df, integer threshold, non-vacuous on the fixture") {
    val rows = llm.TextAnalysis.boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
    val nSources = docs.select("source").distinct().count()
    assert(rows.length.toLong === nSources, "one profile row per source")
    rows.foreach { r =>
      val (nDocs, nGrams, nTemplate, dfSum, maxDf) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(maxDf <= nDocs, "presence-based df is bounded by the doc count")
      assert(nTemplate <= nGrams)
      assert(dfSum >= nTemplate, "each template gram contributes df ≥ 1")
    }
    // the fixture's shared vocabulary must make the threshold bite
    // somewhere — a uniformly-zero template count would be vacuous
    assert(rows.map(_.getLong(3)).sum > 0, "threshold must fire on the fixture")
  }

  test("x_vocab_coverage: monotone curve, exact totals, heap-ranked not sorted") {
    val df = llm.TextAnalysis.vocabCoverage(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === llm.TextAnalysis.CoverageKs.map(_.toLong))
    val totalToks = Tables.documents(spark, sf)
      .select(explode(llm.TextAnalysis.tokens(col("text"))).as("t")).count()
    rows.foreach(r => assert(r.getLong(2) === totalToks, "total pinned to the corpus"))
    val covs = rows.map(_.getDouble(4)).toSeq
    assert(covs === covs.sorted, "coverage must be monotone in K")
    assert(covs.last <= 1.0 + 1e-12 && covs.head > 0.0)
    // once K reaches the type count the curve saturates at exactly 1
    val nTypes = rows.head.getLong(3)
    rows.filter(_.getLong(0) >= nTypes).foreach(r => assert(r.getDouble(4) === 1.0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"global ranking must be the bounded heap:\n${plan.take(2000)}")
  }

  test("x_change_feed: sparse diff with correct change taxonomy") {
    val rows = etl.Cdc.changeFeed(spark, sf).collect()
    val byType = rows.groupBy(_.getString(3))
    assert(!byType.contains("nochange"), "a change feed must be sparse")
    assert(byType("insert").length === 5, "five appended days")
    assert(!byType.contains("delete"), "this chain deletes nothing")
    val expUpdates = etl.RatesSource.rates(spark, sf)
      .filter(dayofmonth(col("date")) % 3 === 0).count()
    assert(byType("update").length.toLong === expUpdates)
    byType("update").foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(1) - 0.5) < 1e-12,
        "update rows carry old AND new values")
    }
    byType("insert").foreach(r => assert(r.isNullAt(1), "inserts have no old value"))
  }

  test("x_vacuum: expired versions fail loudly; pointer and survivors intact") {
    val profile = etl.Cdc.vacuum(spark, sf).collect()
    assert(profile.length === etl.Cdc.VacuumVersions)
    val keepFrom = etl.Cdc.VacuumVersions - etl.Cdc.VacuumKeep
    profile.foreach { r =>
      val (v, kept) = (r.getLong(0), r.getBoolean(1))
      assert(kept === (v >= keepFrom), s"version $v kept=$kept")
      if (kept) assert(!r.isNullAt(2) && r.getLong(2) > 0)
      else assert(r.isNullAt(2) && r.isNullAt(5),
        s"expired version $v must carry NULL stats — its data is gone")
    }
    val root = java.nio.file.Paths.get(etl.Sink.scratchPath(sf, "rates_vacuum"))
    // pointer untouched, newest version readable and value-exact
    assert(etl.Cdc.currentVersion(root) === (etl.Cdc.VacuumVersions - 1).toLong)
    val last = etl.Cdc.readVersion(spark, root, etl.Cdc.VacuumVersions - 1)
    val expect = etl.Cdc.vacuumVersionK(spark, sf, etl.Cdc.VacuumVersions - 1)
    assert(last.count() === expect.count())
    assert(last.agg(sum(col("rate").cast("decimal(18,2)"))).head().getDecimal(0)
      === expect.agg(sum(col("rate").cast("decimal(18,2)"))).head().getDecimal(0))
    // vacuumed version reads are a deliberate, explanatory failure
    val e = intercept[IllegalStateException] {
      etl.Cdc.readVersion(spark, root, 0L)
    }
    assert(e.getMessage.contains("retention"), e.getMessage)
    // never-committed versions are a different error
    intercept[IllegalArgumentException] {
      etl.Cdc.readVersion(spark, root, 99L)
    }
    // idempotent: a second maintenance run changes nothing
    val again = etl.Cdc.vacuum(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq === profile.map(_.toSeq).toSeq)
  }

  test("x_vacuum crash-safety: tombstone-first stays loud and self-heals") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_vacuum_crash_")
    (0 to 2).foreach { v =>
      spark.range(v + 1).write.parquet(root.resolve(s"v$v").toString)
      etl.Cdc.writePointer(root, v.toLong)
    }
    // simulate a crash AFTER the tombstone write, BEFORE the dir delete
    Files.writeString(root.resolve("_vacuumed"), "0")
    // the tombstone alone keeps the read loud even with the dir present
    intercept[IllegalStateException](etl.Cdc.readVersion(spark, root, 0L))
    // the next maintenance run self-heals: re-lists v0 and deletes it
    val removed = etl.Cdc.expireSnapshots(root, 2)
    assert(removed === Seq(0L))
    assert(!Files.exists(root.resolve("v0")))
    assert(etl.Cdc.vacuumedVersions(root) === Seq(0L))
    assert(etl.Cdc.readVersion(spark, root, 2L).count() === 3L)
  }

  test("q_stream_sink recovery: killed between epochs, restart resumes from the checkpoint") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val fmt = classOf[graft.sources.FbInsightsDataSource].getName
    val fullSrc = etl.FbInsightsSource.jsonlPath(spark, sf)
    val days = new java.io.File(fullSrc).list().filter(_.startsWith("date=")).sorted
    assert(days.length >= 4)
    val (firstHalf, secondHalf) = days.splitAt(days.length / 2)
    val work = Files.createTempDirectory("graft_sink_restart_")
    val src = work.resolve("landing"); Files.createDirectories(src)
    val dstTable = work.resolve("table").toString
    val ckpt = work.resolve("ckpt").toString

    def land(dayDirs: Array[String]): Unit = dayDirs.foreach { d =>
      val from = Paths.get(fullSrc, d)
      val to = src.resolve(d); Files.createDirectories(to)
      val listing = Files.list(from)
      try listing.iterator().asScala.foreach(f =>
        Files.copy(f, to.resolve(f.getFileName.toString)))
      finally listing.close()
    }

    def run(): Unit = {
      val q = spark.readStream.format(fmt)
        .option("path", src.toString).option("maxDaysPerBatch", 5000).load()
        .writeStream.format(fmt)
        .option("path", dstTable)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 1: only the first half of the day-partitions has landed; the
    // stream commits that epoch and is then KILLED (query stopped — the
    // deterministic stand-in for a crash after an epoch commit)
    land(firstHalf)
    run()
    val raw = etl.FbInsightsSource.raw(spark, sf)
    val lastFirst = firstHalf.last.substring(5)
    val expectedPrefix = raw.filter(col("date_start") <= lastFirst).count()
    val total = raw.count()
    val afterKill = spark.read.format(fmt).option("path", dstTable).load().count()
    assert(afterKill === expectedPrefix, "first epoch must be all-or-nothing committed")
    assert(afterKill < total, "the kill must leave the stream mid-way")

    // phase 2: the second half lands while the query is down (the
    // append-only landing-zone contract — new days sort after consumed
    // ones); a NEW query restarts from the SAME checkpoint. The day-index
    // offset must resume past the committed prefix (its recorded last-day
    // name validates the listing) and must NOT re-append committed epochs:
    // the final read-back equals the batch source exactly.
    land(secondHalf)
    run()
    val back = spark.read.format(fmt).option("path", dstTable).load()
      .select(raw.columns.map(col).toIndexedSeq: _*)
    // ad_id is NOT unique in the fixture (synthetic lineitem repeats some
    // (orderkey, linenumber) pairs), so no column sort is total — compare
    // as a canonically sorted multiset of full-row renderings
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val (got, want) = (canon(back), canon(raw))
    val missing = want.diff(got)
    val extra = got.diff(want)
    assert(missing.isEmpty && extra.isEmpty,
      s"${missing.size} missing, ${extra.size} extra " +
        s"(e.g. ${(missing ++ extra).take(1)})")
    graft.streaming.Drain.deleteRecursively(work)
  }

  test("x_stream_upsert recovery: stop/restart resumes versions without re-applying batches") {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val work = Files.createTempDirectory("graft_upsert_restart_")
    val snapRoot = work.resolve("snap"); Files.createDirectories(snapRoot)
    val base = etl.RatesSource.rates(spark, sf)
    base.write.parquet(snapRoot.resolve("v0").toString)
    etl.Cdc.writePointer(snapRoot, 0L)
    val chDir = work.resolve("changes"); Files.createDirectories(chDir)

    def stage(df: DataFrame, name: String): Unit = {
      val tmp = work.resolve(s"stage_$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
        finally listing.close()
      Files.move(part, chDir.resolve(s"$name.parquet"))
      graft.streaming.Drain.deleteRecursively(tmp)
    }

    def runOnce(): Unit = {
      val changes = spark.readStream.schema(base.schema).parquet(chDir.toString)
      val q = changes.writeStream.outputMode("append")
        .option("checkpointLocation", work.resolve("ckpt").toString)
        .foreachBatch(etl.Cdc.applyChangeBatch(spark, snapRoot) _)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // q_merge's change set, staged as two separate file drops
    val maxDate = base.agg(max("date")).head().getDate(0)
    val updates = base.filter(dayofmonth(col("date")) % 3 === 0)
      .select(col("date"), col("currencies"), (col("rate") + 0.5).as("rate"))
    val inserts = spark.range(1, 6).select(
      date_add(lit(maxDate), col("id").cast("int")).as("date"),
      lit("USDUAH").as("currencies"),
      (lit(30.0) + col("id").cast("double")).as("rate"))

    stage(updates, "c1")
    runOnce() // applies c1, then the query is killed
    val v1 = etl.Cdc.currentVersion(snapRoot)
    assert(v1 >= 1L, "first run must have committed at least one snapshot")

    stage(inserts, "c2") // lands while the query is down
    runOnce() // restart from the same checkpoint
    val vFinal = etl.Cdc.currentVersion(snapRoot)
    // exactly ONE new version: the checkpoint prevents re-application of
    // the already-committed c1 batch (re-applying would mint extra
    // versions even though this change set happens to be idempotent)
    assert(vFinal === v1 + 1)
    val got = spark.read.parquet(snapRoot.resolve(s"v$vFinal").toString)
      .orderBy("date").collect().map(_.toSeq).toSeq
    val want = queries.EtlQueries.qMerge(spark, sf)
      .select("date", "currencies", "rate")
      .orderBy("date").collect().map(_.toSeq).toSeq
    assert(got === want)
    graft.streaming.Drain.deleteRecursively(work)
  }

  test("fbins catalog: SQL DDL drives the connector (create/insert/select/list/drop)") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft_fbins_wh_").toString
    spark.conf.set("spark.sql.catalog.fbins_t",
      classOf[graft.sources.FbInsightsCatalog].getName)
    spark.conf.set("spark.sql.catalog.fbins_t.warehouse", wh)
    val ddl = etl.Schemas.fbInsightsRaw.toDDL

    // managed table at the warehouse-derived path
    spark.sql(s"CREATE TABLE fbins_t.db.managed ($ddl) USING fbinsights")
    assert(new java.io.File(s"$wh/db/managed").isDirectory)
    // external table at an explicit LOCATION
    val loc = Files.createTempDirectory("graft_fbins_loc_").toString
    spark.sql(s"CREATE TABLE fbins_t.db.ext ($ddl) USING fbinsights LOCATION '$loc'")

    // INSERT through SQL lands day-partitions at the external location;
    // SELECT through SQL reads them back losslessly
    etl.FbInsightsSource.raw(spark, sf).createOrReplaceTempView("fb_cat_src")
    val n = spark.table("fb_cat_src").count()
    spark.sql("INSERT INTO fbins_t.db.ext SELECT * FROM fb_cat_src")
    assert(new java.io.File(loc).list().exists(_.startsWith("date=")))
    assert(spark.sql("SELECT * FROM fbins_t.db.ext").count() === n)

    // listing is warehouse-derived: the managed table shows, and SHOW
    // TABLES goes through the catalog plugin
    val listed = spark.sql("SHOW TABLES IN fbins_t.db")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(listed.contains("managed"))

    // declared schemas must match the connector's fixed insights schema
    val err = intercept[Exception] {
      spark.sql("CREATE TABLE fbins_t.db.bad (x INT) USING fbinsights")
    }
    assert(err.getMessage.contains("fixed insights schema"))

    // DROP removes the directory
    spark.sql("DROP TABLE fbins_t.db.managed")
    assert(!new java.io.File(s"$wh/db/managed").exists())
    spark.sql("DROP TABLE fbins_t.db.ext")
    graft.streaming.Drain.deleteRecursively(java.nio.file.Paths.get(wh))
  }

  test("q_compact: size-targeted rewrite bounds file sizes by the target at two SFs") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val nBySf = for (sfd <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) yield {
      val target = 64L * 1024
      // stage fb_stat for THIS sf first: on a cold warehouse nothing else
      // has staged sf0.01, and dataBytes of an absent table is 0
      queries.EtlQueries.fbStatTable(spark, sfd).head()
      val srcBytes = etl.Sink.dataBytes(etl.Sink.scratchPath(sfd, "fb_stat"))
      val dst = queries.EtlQueries.compactSized(spark, sfd, target, "fb_stat_sized_spec")
      val walk = Files.walk(Paths.get(dst))
      val sizes =
        try walk.iterator().asScala
          .filter(p => Files.isRegularFile(p) && {
            val n = p.getFileName.toString; !n.startsWith("_") && !n.startsWith(".")
          })
          .map(Files.size).toSeq
        finally walk.close()
      val n = etl.Sink.sizedPartitions(srcBytes, target)
      assert(n > 1, s"target must bite at $sfd (srcBytes=$srcBytes)")
      info(s"$sfd: srcBytes=$srcBytes n=$n files=${sizes.length} " +
        s"median=${sizes.sorted.apply(sizes.length / 2)} max=${sizes.max}")
      // the guarantee that matters at scale: NO file exceeds the target
      // band (input-bytes sizing over-estimates re-encoded output — the
      // tiny-file source is footer-dominated — so slices only come in
      // UNDER target; at 100 TB input ≈ output and sizes converge on it)
      assert(sizes.max <= 2 * target,
        s"file of ${sizes.max} bytes blows the $target-byte target at $sfd")
      // file count tracks the sized shuffle width: ~n range slices, each
      // month boundary can split a slice across two month dirs
      assert(sizes.length >= n / 2 && sizes.length <= 3 * n + 100,
        s"file count ${sizes.length} far from sized n=$n at $sfd")
      n
    }
    // the formula responds to input volume: 10x the data, more slices
    assert(nBySf(1) > nBySf(0), s"sized n must grow with input bytes: $nBySf")
  }

  test("x_histogram: buckets clamp to [0,19], counts partition the non-null rows") {
    val hist = llm.Analytics.histogram(spark, sf).collect()
    assert(hist.nonEmpty)
    val buckets = hist.map(_.getLong(1))
    assert(buckets.forall(b => b >= 0 && b < llm.Analytics.NumBins))
    // bin bounds are the bucket index times the width, exactly
    hist.foreach { r =>
      assert(r.getDouble(2) === r.getLong(1) * llm.Analytics.BinWidth)
      assert(r.getDouble(3) === (r.getLong(1) + 1) * llm.Analytics.BinWidth)
    }
    // the histogram partitions the filtered input: per-type counts match
    val perType = hist.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(4)).sum)
    val expected = Tables.events(spark, sf)
      .filter(col("value").isNotNull && !isnan(col("value")))
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perType.toMap === expected)
  }

  test("x_incr_agg: merged base+delta state equals the full recompute") {
    import org.apache.spark.sql.types.DecimalType
    val merged = llm.Analytics.incrementalAgg(spark, sf)
      .collect().map(_.toSeq).toSeq
    val full = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("total"))
      .select(col("day"), col("event_type"), col("n"),
        col("total").cast("double").as("total_value"),
        (col("total").cast("double") / col("n").cast("double")).as("avg_value"))
      .orderBy("day", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(merged === full)
  }

  test("x_incr_agg: the base/delta split is null-complete (no row lost to 3VL)") {
    // a NULL event_id must land in exactly one side of the split
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((10L, "a"), (3L, "a"), (null, "a"))
      .toDF("event_id", "x")
    val isDelta = col("event_id") % 10 === 0
    val base = df.filter(!isDelta || col("event_id").isNull).count()
    val delta = df.filter(isDelta).count()
    assert(base + delta === df.count())
  }

  test("x_overlap: intersection bounded by set sizes, jaccard consistent") {
    val rows = llm.Analytics.overlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, common, jac) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(r.getString(0) < r.getString(1)) // canonical pair order
      assert(common >= 1 && common <= math.min(na, nb))
      assert(jac === common.toDouble / (na + nb - common).toDouble)
    }
    // spot-check one pair against a direct computation
    val h = rows.head
    val direct = Tables.events(spark, sf)
      .filter(col("event_type").isin(h.getString(0), h.getString(1)))
      .groupBy("user_id").agg(countDistinct("event_type").as("k"))
      .filter(col("k") === 2).count()
    assert(h.getLong(4) === direct)
  }

  test("x_stratified: keep decision is stable across runs and honors 0%/100% strata") {
    val r1 = llm.Sampling.stratified(spark, sf).collect().map(_.toSeq).toSeq
    val r2 = llm.Sampling.stratified(spark, sf).collect().map(_.toSeq).toSeq
    assert(r1 === r2)
    val byType = r1.map(row => row.head.asInstanceOf[String] -> row).toMap
    // 0% stratum keeps nothing; 100% stratum keeps everything
    assert(byType("error")(2) === 0L)
    assert(byType("purchase")(1) === byType("purchase")(2))
  }

  test("AQE skew-join: the engine-native path splits the hot partition (sibling of manual salting)") {
    // x_skew_join salts by hand; this pins the engine-native alternative —
    // AQE's OptimizeSkewedJoin — over the same skewed fixture, so both
    // mitigation shapes are proven. Thresholds are lowered to make the
    // fixture's hot event_type partition legally "skewed" at test scale;
    // at 100 TB the defaults (256 MB / 5× median) fire on their own.
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // no broadcast: the skew path needs a shuffled join on both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the sf0.001 fixture's event_type counts are near-uniform (the
      // x_skew story is few-giant-keys at scale, not count imbalance at
      // 1k rows), so amplify the hot key deterministically: every
      // 'click' row replicated 50× — the shape the defaults would see
      // at 100 TB, at thresholds this test can afford
      // repartition(8) first: a skewed reduce partition is split along its
      // MAP-output boundaries, so a single-mapper stage (one tiny parquet
      // file) can never be split no matter how skewed it reads
      val ev = Tables.events(spark, sf)
        .repartition(8)
        .withColumn("rep", explode(sequence(lit(1),
          when(col("event_type") === "click", lit(50)).otherwise(lit(1)))))
      // dim pre-materialized to a local table: OptimizeSkewedJoin only
      // matches Sort directly over the shuffle stage — an aggregate
      // between them (distinct()) hides the join from the rule
      import spark.implicits._
      val dim = ev.select(col("event_type")).distinct().as[String].collect().sorted.toSeq
        .toDF("event_type")
        .withColumn("weight", (length(col("event_type")) % 5 + 1).cast("long"))
      // no aggregate on the join key downstream: AQE refuses to split a
      // skewed partition whose output partitioning a parent still needs
      val joined = ev.join(dim, Seq("event_type"))
        .select(col("event_type"), col("event_id"), col("rep"), col("weight"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected AQE to mark the hot partition skewed and split it:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("DPP: a dim-side filter prunes the day-partitioned fact at runtime") {
    // the engine-native sibling of the connector's SupportsRuntimeFiltering
    // spec: over plain partitioned parquet, Catalyst's dynamic partition
    // pruning must inject the join's build-side date values into the fact
    // scan's partition filters — at 100 TB this is the difference between
    // scanning 3 day-partitions and scanning 2,400
    queries.EtlQueries.fbStatTable(spark, sf) // ensure the layout exists
    val fact = spark.read.parquet(etl.Sink.scratchPath(sf, "fb_stat"))
    val dim = etl.RatesSource.rates(spark, sf)
      .filter(dayofmonth(col("date")) === 15) // selective, data-derived
      .select(col("date"))
    val joined = fact.join(dim, Seq("date")).select(col("date"), col("ad_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan must carry a runtime partition filter:\n${plan.take(3000)}")
    assert(joined.collect().nonEmpty)
  }

  test("x_pagerank: ranks conserve probability mass; dims broadcast in the edge build") {
    val df = llm.Graph.pageRank(spark, sf)
    val rows = df.collect()
    assert(rows.length > 1)
    // PageRank is a probability distribution: with dangling redistribution
    // the ranks sum to 1 up to round-6 per-row truncation
    val mass = rows.map(_.getDouble(3)).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"rank mass $mass drifted from 1")
    rows.foreach(r => assert(r.getDouble(3) > 0.0, s"rank must be positive: $r"))
    // the fact-side joins must be broadcast — the edge build is the only
    // part of the operator that touches fixture-scale data
    val plan = llm.Graph.tradeEdges(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast dim joins in the edge build:\n${plan.take(2000)}")
  }

  test("x_pagerank: a dangling sink keeps mass conserved and outranks its feeders") {
    import spark.implicits._
    // star: 1..4 all point at 5; 5 has no out-edges (dangling)
    val edges = Seq((1L, 5L, 1L), (2L, 5L, 1L), (3L, 5L, 1L), (4L, 5L, 2L))
      .toDF("src", "dst", "w")
    val r = llm.Graph.pageRankOf(edges).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-12, s"mass not conserved: $r")
    assert(r(5L) > r(1L) * 3, s"sink must dominate its feeders: $r")
    assert(Seq(1L, 2L, 3L, 4L).map(r).distinct.size === 1,
      "symmetric feeders must tie exactly")
  }

  test("x_grouping_sets: marginals re-aggregate the per-cell set exactly") {
    val rows = llm.Events.groupingSets(spark, sf).collect()
    def bucket(gid: Long) = rows.filter(_.getLong(2) == gid)
    val cells = bucket(0) // (event_type, dow)
    val byType = bucket(1) // (event_type) — dow grouped out
    val total = bucket(3) // ()
    assert(total.length === 1 && cells.nonEmpty && byType.nonEmpty)
    assert(total.head.getLong(3) === cells.map(_.getLong(3)).sum,
      "grand total must equal the sum of the per-cell counts")
    byType.foreach { m =>
      val t = m.getString(0)
      assert(m.getLong(3) === cells.filter(_.getString(0) == t).map(_.getLong(3)).sum,
        s"per-type marginal for $t must re-aggregate its cells")
    }
    // one Expand feeding one aggregate — all four sets in a single pass
    val plan = llm.Events.groupingSets(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets must plan as Expand, not a union of scans")
  }

  test("x_window_funcs: ntile balance and percent_rank bounds per partition") {
    val rows = llm.Events.windowFuncs(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (t, qs) =>
      assert(qs.length === 4, s"$t: expected 4 quartiles, got ${qs.length}")
      val sizes = qs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$t: ntile sizes must differ by ≤1: ${sizes.toSeq}")
      qs.foreach { r =>
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"mean_pr out of [0,1]: $r")
        assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, s"max_cd out of (0,1]: $r")
      }
      // the top quartile's cume_dist reaches exactly 1 (last row of the partition)
      assert(qs.maxBy(_.getLong(1)).getDouble(5) === 1.0)
    }
  }

  test("x_cooccur: df gate bounds the pair space; counts are consistent") {
    val rows = llm.TextAnalysis.cooccur(spark, sf).collect()
    assert(rows.length === 30)
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (cxy, cx, cy) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ta < tb, s"pairs must be canonical (a < b): $r")
      assert(cxy <= math.min(cx, cy), s"pair count cannot exceed either df: $r")
      assert(r.getLong(5) > 0, s"association score must be positive: $r")
      // 'dup' sits at 5% df in the fixture — the 25% gate must drop it
      assert(ta != "dup" && tb != "dup", s"rare token must be gated out: $r")
    }
  }

  test("x_sample_topk: TopKPerKey matches the row_number window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val got = llm.Sampling.sampleTopK(spark, sf)
    val ranked = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        RollingHash.rolling_hash(col("text")).as("fp"))
      .withColumn("rank",
        row_number().over(Window.partitionBy("source").orderBy("fp", "doc_id")).cast("long"))
      .filter(col("rank") <= llm.Sampling.SamplePerKey)
      .select("source", "rank", "doc_id", "fp")
      .orderBy("source", "rank")
    assert(got.collect().toSeq === ranked.collect().toSeq,
      "bounded-heap top-k must reproduce the window semantics bit-for-bit")
    // and the custom operator must actually be in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected the custom physical operator:\n${plan.take(2000)}")
  }

  test("x_rep_ngram / x_gopher: exact-integer rules, every rule exercised both ways") {
    val rep = llm.TextAnalysis.repNgram(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), s"dup_occ cannot exceed tri_occ: $r")
      val rate = r.getDouble(5)
      assert(rate >= 0.0 && rate < 1.0, s"rep_rate out of range: $r")
      // one division of two exact BIGINTs — recompute and demand bit equality
      assert(rate === r.getLong(2).toDouble / r.getLong(3).toDouble)
    }
    val g = llm.TextAnalysis.gopherRules(spark, sf).collect()
    val nDocs = g.map(_.getLong(1)).sum
    def failCol(i: Int) = g.map(_.getLong(i)).sum
    // calibration contract: every rule must have both failing and passing
    // docs in the fixture, or the rule's predicate is untested
    (2 to 5).foreach { i =>
      assert(failCol(i) > 0, s"rule col $i never fails — threshold vacuous")
      assert(failCol(i) < nDocs, s"rule col $i always fails — threshold vacuous")
    }
    val nPass = g.map(_.getLong(6)).sum
    assert(nPass > 0 && nPass < nDocs, "composite pass must split the corpus")
    g.foreach { r =>
      val maxFail = (2 to 5).map(r.getLong).max
      assert(r.getLong(6) <= r.getLong(1) - maxFail,
        s"n_pass cannot exceed n_docs minus the worst rule's failures: $r")
    }
  }

  test("x_triangles: census invariants on the candidate graph + closed-form clique check") {
    val row = llm.Graph.triangles(spark, sf).head()
    val (nodes, edges, wedges, tris) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nodes > 0 && edges > 0)
    assert(tris <= wedges, "every triangle is a closed wedge")
    assert(tris > 0, "fixture near-dup clusters must contain at least one triangle")
    // closed-form check: K4 has exactly 4 triangles, 0 extra wedges open
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val k4row = llm.Graph.trianglesOf(k4).head()
    assert(k4row.getLong(3) === 4L, s"K4 must have 4 triangles: $k4row")
    assert(k4row.getLong(2) === 4L, s"K4's degree orientation yields exactly 4 wedges: $k4row")
    // path graph: the orientation points both edges INTO the high-degree
    // center, so no node holds two out-edges — 0 wedges, 0 triangles
    // (exactly the property that kills hub-degree² blowup on skewed graphs)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val prow = llm.Graph.trianglesOf(path).head()
    assert(prow.getLong(2) === 0L && prow.getLong(3) === 0L)
    // open wedge that the orientation DOES keep: center 1 has the lowest
    // degree, so both its edges orient outward; (2,3) is absent → no close
    val open = Seq((1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 6L), (3L, 7L))
      .toDF("id_a", "id_b")
    val orow = llm.Graph.trianglesOf(open).head()
    assert(orow.getLong(2) === 1L && orow.getLong(3) === 0L,
      s"expected one open wedge at the low-degree center: $orow")
  }

  test("x_global_ids: dense 0..N-1 permutation, equal to the window formulation") {
    val rows = llm.Sampling.globalIds(spark, sf).collect()
    val n = rows.map(_.getLong(1)).sum
    assert(n > 0)
    assert(rows.map(_.getLong(2)).min === 0L, "global min id must be 0")
    assert(rows.map(_.getLong(3)).max === n - 1, "global max id must be N-1")
    assert(rows.map(_.getLong(4)).sum === n * (n - 1) / 2,
      "id sum must be the 0..N-1 triangular number — ids are a dense permutation")
    // the partition-offset implementation must equal row_number() - 1
    // bit-for-bit, checksum included
    import org.apache.spark.sql.expressions.Window
    val win = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        RollingHash.rolling_hash(col("text")).as("fp"))
      .withColumn("id", (row_number().over(Window.orderBy("fp", "doc_id")) - 1).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), min("id").as("min_id"), max("id").as("max_id"),
        sum("id").as("sum_id"), sum(col("id") * col("doc_id")).as("id_checksum"))
      .orderBy("source")
    assert(rows.toSeq === win.collect().toSeq)
  }

  test("x_fuzzy_join: every variant resolves to an edit-distance-1 (or exact) token via banding") {
    val rows = llm.Dedup.fuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= 1L, s"best match must be within distance 1: $r")
      assert(r.getLong(1) >= 1L, s"the matched token must be among the candidates: $r")
      // the banding promise: an edit-distance-1 pair shares a 2-gram, so
      // the true match is never pruned — each variant (one deletion from
      // a real ≥4-char token) must surface a match
    }
    // typo model sanity: most variants are one deletion from their source
    // token, so distance 1 must dominate (distance 0 only when the typo
    // collides with another real vocabulary word)
    assert(rows.count(_.getLong(3) == 1L) >= rows.length / 2)
  }

  test("x_transitions: rows are a stochastic matrix over observed steps") {
    val rows = llm.Events.transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    // per prev_type: rates sum to 1 (exact rationals n/row_total over one
    // shared denominator, so the double sum is exact up to one ulp each)
    rows.groupBy(_.getString(0)).foreach { case (p, rs) =>
      val total = rs.head.getLong(3)
      assert(rs.forall(_.getLong(3) == total), s"$p: row_total must be shared")
      assert(rs.map(_.getLong(2)).sum === total, s"$p: counts must sum to the row total")
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-9, s"$p: rates must sum to 1")
    }
    // total steps = events per user minus one first-event per user
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected,
      "every non-first event contributes exactly one transition")
  }

  test("q_join_fx_asof_tol: tolerance voids stale conversions without losing the rows") {
    val rows = queries.EtlQueries.qJoinFxAsofTol(spark, sf).collect()
    assert(rows.nonEmpty)
    // both branches must be real: the two-day fixture gaps put day one
    // within tolerance (carried) and day two beyond it (stale)
    assert(rows.map(_.getLong(2)).sum > 0, "no carried conversions — fill not exercised")
    assert(rows.map(_.getLong(3)).sum > 0, "no stale rows — the tolerance never bit")
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) <= r.getLong(1),
        s"carried + stale cannot exceed the month's rows: $r")
      // stale spend is surfaced, never silently converted
      if (r.getLong(3) > 0) assert(r.getDouble(5) > 0.0, s"stale rows must carry unpriced spend: $r")
    }
  }

  test("x_decay: decayed counts bounded by raw counts and dominated by recent mass") {
    val rows = llm.Events.decayed(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dn) = (r.getLong(1), r.getDouble(3))
      assert(dn > 0.0 && dn <= n.toDouble, s"decayed_n must lie in (0, n]: $r")
    }
    // weights are capped dyadics: recompute one type brute-force
    import org.apache.spark.sql.Row
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), col("ts").cast("date").as("day")).collect()
    val d1 = ev.map(_.getDate(1).toLocalDate).max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val t = rows.head.getString(0)
    val brute = ev.filter(_.getString(0) == t).map { r =>
      val h = math.min((d1.toEpochDay - r.getDate(1).toLocalDate.toEpochDay) / 7,
        llm.Events.DecayCapHalfLives.toLong)
      1.0 / (1L << h).toDouble
    }.sum
    assert(math.abs(rows.head.getDouble(3) - brute) < 1e-6,
      s"decayed_n for $t must match the brute-force weight sum")
  }

  test("x_dsir: copy counts exact per rate regime and expectation-bounded") {
    val rows = llm.Sampling.dsir(spark, sf).collect()
    assert(rows.length == 20, "all 20 sources present, sampled or not")
    rows.foreach { r =>
      val (src, nDocs, sampled) = (r.getString(0), r.getLong(1), r.getLong(3))
      val pct = (src.stripPrefix("src").toLong % 5) * 60
      val whole = pct / 100
      assert(sampled >= whole * nDocs && sampled <= (whole + 1) * nDocs,
        s"$src: copies must be per-doc {${whole},${whole + 1}}: $r")
      if (pct == 0) assert(sampled == 0, s"rate-0 source must drop everything: $r")
    }
    // the three regimes all execute on the fixture
    assert(rows.exists(_.getLong(3) == 0), "a dropped source")
    assert(rows.exists(r => r.getLong(3) > 0 && r.getLong(3) < r.getLong(1)),
      "a downsampled source")
    assert(rows.exists(r => r.getLong(3) > r.getLong(1)), "an upsampled source")
  }

  test("x_mixture: weights transform the observed mix into the target mix") {
    val rows = llm.Sampling.mixture(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(3)).sum == 100L, "target shares sum to 100%")
    val total = rows.map(_.getLong(2)).sum.toDouble
    rows.foreach { r =>
      val (tokens, target, w) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(w > 0.0, s"weight must be positive: $r")
      // the defining identity: w * tokens = target share of the corpus
      assert(math.abs(w * tokens - target * total / 100.0) < 1e-6, s"identity fails: $r")
    }
  }

  test("x_shard_manifest: token mass conserved, shards contiguous and near-balanced") {
    val rows = llm.Sampling.shardManifest(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(size(llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"), col("doc_id"))
      .agg(sum("n"), count(lit(1)), sum("doc_id")).head()
    val (totalTokens, nDocs, sumDocIds) = (docs.getLong(0), docs.getLong(1), docs.getLong(2))
    assert(rows.map(_.getLong(2)).sum == totalTokens, "token mass conserved")
    assert(rows.map(_.getLong(1)).sum == nDocs, "every doc in exactly one shard")
    assert(rows.map(_.getLong(3)).sum == sumDocIds, "doc_id checksum conserved")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < llm.Sampling.NShards))
    // balance: each shard within one max-doc-length of the ideal cut
    val maxDoc = Tables.documents(spark, sf)
      .agg(max(size(llm.TextAnalysis.tokens(col("text"))))).head().getInt(0).toLong
    val ideal = totalTokens.toDouble / llm.Sampling.NShards
    rows.foreach { r =>
      assert(math.abs(r.getLong(2) - ideal) <= maxDoc + 1,
        s"shard ${r.getLong(0)} off the ideal cut by more than one doc: $r")
    }
  }

  test("x_novelty: every distinct corpus bigram is novel exactly once") {
    val rows = llm.TextAnalysis.ngramNovelty(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (nBi, nNov, rate) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nNov >= 0 && nNov <= nBi, s"novel must be within distinct: $r")
      assert(rate >= 0.0 && rate <= 1.0, s"rate must be a fraction: $r")
    }
    // conservation: a bigram's first occurrence flags exactly one doc, so
    // the novel total IS the corpus-wide distinct bigram count
    val distinctBigrams = Tables.documents(spark, sf)
      .select(llm.TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))")).as("bg"))
      .distinct().count()
    assert(rows.map(_.getLong(3)).sum == distinctBigrams,
      "sum of novel bigrams must equal corpus distinct bigrams")
  }

  test("x_bpe: merge counts non-increasing and round 1 matches brute force") {
    val rows = llm.TextAnalysis.bpeMerges(spark, sf).collect()
    assert(rows.length == llm.TextAnalysis.BpeMergeCount)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq, "dense ranks")
    // pc_k <= pc_{k-1} is a theorem: old pair counts never increase and a
    // pair minted by merge k-1 occurs at most as often as that merge did
    val pcs = rows.map(_.getLong(3))
    assert(pcs.zip(pcs.tail).forall { case (a, b) => b <= a }, s"counts must not increase: ${pcs.toSeq}")
    // brute-force round 1: most frequent adjacent char pair, word-weighted
    val words = Tables.documents(spark, sf)
      .select(explode(llm.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c")).collect()
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    words.foreach { r =>
      val (w, c) = (r.getString(0), r.getLong(1))
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
    }
    val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
    assert((rows(0).getString(1), rows(0).getString(2)) == best._1 &&
      rows(0).getLong(3) == best._2, s"round 1 must be the brute-force argmax: ${rows(0)} vs $best")
  }

  test("x_gini: impurity and top share bounded, one source matches brute force") {
    val rows = llm.TextAnalysis.gini(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (n, vocab, top, g) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(vocab >= 1 && vocab <= n, s"vocab within token count: $r")
      assert(top > 0.0 && top <= 1.0 && g >= 0.0 && g < 1.0, s"bounded: $r")
    }
    val src = rows.head.getString(0)
    val counts = Tables.documents(spark, sf).filter(col("source") === src)
      .select(explode(llm.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect().map(_.getLong(1))
    val n = counts.sum.toDouble
    val brute = (n * n - counts.map(c => c.toDouble * c).sum) / (n * n)
    assert(math.abs(rows.head.getDouble(4) - brute) < 1e-12,
      s"$src gini must match brute force: ${rows.head.getDouble(4)} vs $brute")
  }

  test("x_embed_drift: moments recount exactly; identical cohorts drift zero") {
    val rows = llm.Analytics.embedDrift(spark, sf).collect()
    assert(rows.length === 64, "one row per embedding dimension")
    // the counts partition the corpus: n_a + n_b = vectors, per dim
    val nVecs = Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === nVecs)
      // the integer drift recomputes bit-for-bit from the published moments
      assert(r.getLong(5) ===
        math.abs(r.getLong(3) * r.getLong(2) - r.getLong(4) * r.getLong(1)))
      assert(r.getDouble(7) ===
        r.getLong(5).toDouble / (r.getLong(1) * r.getLong(2)).toDouble)
      assert(r.getDouble(8) >= 0.0)
    }
    // the fixture cohorts genuinely differ somewhere (a degenerate
    // all-zero report would make the operator vacuous)
    assert(rows.exists(_.getLong(5) > 0L))
    // zero law: driving the core with two IDENTICAL cohorts must report
    // exactly zero drift on every dimension — integer zeros AND float
    // zeros (the one-division readouts inherit exactness)
    val qf = Tables.embeddings(spark, sf)
      .select(posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT))")))
      .toDF("dim", "q")
    val twin = qf.select(lit(0L).as("cohort"), col("dim"), col("q"))
      .unionByName(qf.select(lit(1L).as("cohort"), col("dim"), col("q")))
    llm.Analytics.embedDriftOf(twin).collect().foreach { r =>
      assert(r.getLong(5) === 0L && r.getLong(6) === 0L)
      assert(r.getDouble(7) === 0.0 && r.getDouble(8) === 0.0)
    }
  }

  test("x_freshness: span partitions into active+missing; freshest stream lags zero") {
    val rows = llm.Events.freshness(spark, sf).collect()
    assert(rows.nonEmpty, "every fixture event_type reports")
    rows.foreach { r =>
      val (nActive, lag, span, missing, ppm) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      assert(span === nActive + missing, s"span must partition: $r")
      assert(lag >= 0L && missing >= 0L, s"non-negative lag/gaps: $r")
      assert(ppm === nActive * 1000000L / span, s"ppm recomputes: $r")
      assert(r.getLong(1) >= nActive, s"events >= active days: $r")
    }
    // the global max day is some stream's last day, so min lag is exactly 0
    assert(rows.map(_.getLong(5)).min === 0L, "freshest stream must lag zero")
    // recount one stream end-to-end against the raw events
    val t = rows.head.getString(0)
    val days = Tables.events(spark, sf).filter(col("event_type") === t)
      .select(col("ts").cast("date")).distinct().collect().map(_.getDate(0))
    assert(rows.head.getLong(4) === days.length.toLong)
    assert(rows.head.getDate(2) === days.min && rows.head.getDate(3) === days.max)
  }

  test("x_soft_dedup: cluster mass conserved; untouched sources keep full weight") {
    val rows = llm.Dedup.softDedup(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "every doc weighs in once")
    rows.foreach { r =>
      val (n, dup, effDocs) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(effDocs <= n * 1000000L, s"soft weight never exceeds raw mass: $r")
      if (dup == 0L) {
        assert(effDocs === n * 1000000L, s"untouched source keeps full mass: $r")
        assert(r.getLong(5) === r.getLong(2) * 1000000L, s"token mass too: $r")
      }
    }
    // recount the global effective doc mass from the shared component
    // labels: non-members weigh 10^6, members 10^6 div cluster-size
    val sizes = llm.Dedup.componentsTable(spark, sf)
      .groupBy("comp").agg(count(lit(1)).as("s")).collect().map(_.getLong(1))
    val memberMass = sizes.map(s => s * (1000000L / s)).sum
    val nMembers = sizes.sum
    assert(rows.map(_.getLong(4)).sum === (nDocs - nMembers) * 1000000L + memberMass,
      "per-source ppm masses recount from the component sizes")
    // and the touched-doc count matches the component membership
    assert(rows.map(_.getLong(3)).sum ===
      sizes.filter(_ > 1L).sum, "dup members = members of size>1 clusters")
  }

  test("x_knn_classify: votes bounded by k; winner matches a driver-side brute recount") {
    val rows = llm.Similarity.knnClassify(spark, sf).collect()
    assert(rows.nonEmpty, "the classify sample is non-empty at sf0.001")
    rows.foreach { r =>
      val (votes, n) = (r.getLong(3), r.getLong(4))
      assert(votes >= 1L && votes <= n && n <= llm.Similarity.KnnClassK, s"vote bounds: $r")
      assert(r.getLong(5) === (if (r.getLong(1) == r.getLong(2)) 1L else 0L), s"correct flag: $r")
    }
    // brute recount of one point on the driver: nearest labeled neighbors
    // by the same (cosine desc, id) order, then plurality (votes desc,
    // label asc)
    val all = Tables.embeddings(spark, sf).collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), v, r.getInt(2).toLong, math.sqrt(v.map(x => x * x).sum))
    }.filter(_._4 > 0)
    val qid = rows.head.getLong(0)
    val (_, qv, qlab, qn) = all.find(_._1 == qid).get
    val top = all.filter(t => t._1 % 3 == 0)
      .map(t => (t._1, t._3, t._2.zip(qv).map { case (a, b) => a * b }.sum / (t._4 * qn)))
      .sortBy(t => (-t._3, t._1)).take(llm.Similarity.KnnClassK)
    val winner = top.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy(t => (-t._2, t._1)).head
    assert(rows.head.getLong(2) === winner._1 && rows.head.getLong(3) === winner._2.toLong)
    assert(rows.head.getLong(1) === qlab)
  }

  test("x_betweenness: per-pair conservation sigma_st*(d_st-1) and endpoint exclusion") {
    val und = llm.Graph.thresholdedUndirected(spark, sf)
    val rows = llm.Graph.betweenness(spark, sf).collect()
    assert(rows.nonEmpty, "every graph node reports")
    rows.foreach { r => assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L) }
    assert(rows.exists(_.getLong(1) > 0L), "some broker exists on the fixture graph")
    // closed-form conservation: summed over interior nodes, each (s, t)
    // pair contributes sigma_st * (d_st - 1) — recount with a driver BFS
    val edges = und.collect().map(r =>
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet.toSeq.sorted
    def bfs(s: Long): Map[Long, (Int, Long)] = {
      var lvl = Map(s -> (0, 1L)); var frontier = Map(s -> 1L)
      (1 to llm.Graph.ClosenessRounds).foreach { d =>
        val nxt = scala.collection.mutable.Map.empty[Long, Long]
        frontier.foreach { case (u, sg) =>
          adj.getOrElse(u, Set.empty).foreach { v =>
            if (!lvl.contains(v)) nxt(v) = nxt.getOrElse(v, 0L) + sg
          }
        }
        lvl = lvl ++ nxt.map { case (v, sg) => v -> (d, sg) }
        frontier = nxt.toMap
      }
      lvl
    }
    val all = nodes.map(s => s -> bfs(s)).toMap
    var expectedTotal = 0L
    for (s <- nodes; t <- nodes if s < t; st <- all(s).get(t))
      expectedTotal += st._2 * (st._1 - 1).toLong
    assert(rows.map(_.getLong(1)).sum === expectedTotal,
      "total stress equals the sum over pairs of sigma_st*(d_st-1)")
  }

  test("x_maxsim: score bounds, exact-match consistency, and a driver-side recount") {
    val rows = llm.TextAnalysis.maxsim(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= llm.TextAnalysis.MaxSimTopK)
    val q = llm.TextAnalysis.MaxSimQTokens.toLong
    val b = llm.TextAnalysis.MaxSimBits.toLong
    rows.foreach { r =>
      assert(r.getLong(3) <= q * b && r.getLong(3) >= -q * b, s"score bounds: $r")
      assert(r.getLong(2) >= 0L && r.getLong(2) <= q, s"exact-match count bounds: $r")
      assert(r.getLong(3) >= r.getLong(2) * b - (q - r.getLong(2)) * b,
        s"exact matches floor the score: $r")
    }
    // served list is sorted by (score desc, doc_id)
    rows.sliding(2).foreach {
      case Array(a, c) =>
        assert(a.getLong(3) > c.getLong(3) ||
          (a.getLong(3) == c.getLong(3) && a.getLong(0) < c.getLong(0)))
      case _ => ()
    }
    // recount the top hit on the driver with the same kernel
    def toks(s: String): Seq[String] =
      s.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    def h(t: String): Long =
      t.codePoints().toArray.foldLeft(0L)((a, c) => (a * 131 + c) % 2147483647L)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qts = toks(docs(0L)).sorted.take(llm.TextAnalysis.MaxSimQTokens).map(h)
    val top = rows.head
    val dts = toks(docs(top.getLong(0))).map(h)
    val expected = qts.map(hq => dts.map(hd =>
      b - 2L * java.lang.Long.bitCount((hq ^ hd) & 65535L)).max).sum
    assert(top.getLong(3) === expected, "driver recount of the top hit agrees")
  }

  test("x_stream_pipeline: ledger conserves arrivals; stage-1 matches the batch predicate") {
    val rows = llm.StreamingOps.streamingPipeline(spark, sf).collect()
    assert(rows.length === 4, "one ledger row per replayed chunk")
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    rows.foreach { r =>
      assert(r.getLong(1) ===
        r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5),
        s"every arrival is dropped at exactly one stage or accepted: $r")
    }
    val delta = Tables.documents(spark, sf).filter(pmod(col("doc_id"), lit(10L)) === 0L)
    assert(rows.map(_.getLong(1)).sum === delta.count(), "arrivals cover the delta")
    // stage-1 drops recount against the batch quality predicate per chunk
    val qdrop = delta
      .join(llm.Pipeline.qualityOf(llm.Pipeline.enrichedOf(delta)).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .groupBy(pmod(expr("doc_id div 10"), lit(4L)).as("chunk"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === qdrop.getOrElse(r.getLong(0), 0L),
        s"quality drops match the batch predicate: $r")
    }
    // an accepted doc's id mass stays within its chunk's id range
    rows.foreach { r =>
      if (r.getLong(5) > 0L) assert(r.getLong(6) > 0L, s"accepted mass witnessed: $r")
    }
  }

  test("x_dataset_card: columns reconcile with the standalone operators they summarize") {
    val rows = llm.Pipeline.datasetCard(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "docs partition by source")
    rows.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) / r.getLong(1), s"mean recomputes: $r")
      assert(r.getLong(7) <= r.getLong(1), s"top-lang share bounded: $r")
      assert(r.getLong(5) >= 1L && r.getString(6).nonEmpty, s"a dominant language exists: $r")
      assert(r.getLong(8) <= r.getLong(1) && r.getLong(9) <= r.getLong(1), s"flag bounds: $r")
    }
    // reconcile with the drill-down operators' own totals
    val kept = llm.Dedup.exact(spark, sf).count()
    assert(rows.map(_.getLong(9)).sum === kept,
      "exact keepers match x_dedup_exact's group count")
    val members = llm.Dedup.componentsTable(spark, sf).count()
    assert(rows.map(_.getLong(10)).sum === members,
      "near-dup members match the shared component labels")
    val qualityKept = llm.TextAnalysis.qualityFilter(spark, sf).collect()
      .map(_.getLong(2)).sum
    assert(rows.map(_.getLong(8)).sum === qualityKept,
      "quality passers match x_quality_filter's kept count")
  }

  test("x_ann_curve: monotone cost and recall; exhaustive probe point matches brute") {
    val rows = llm.Similarity.annCurve(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === llm.Similarity.NProbeSweep,
      "one row per sweep point")
    // widening the probe set can only add candidates and hits
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) <= b.getLong(3), s"candidate volume monotone: $a -> $b")
        assert(a.getLong(4) <= b.getLong(4), s"recall hits monotone: $a -> $b")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "served <= queries")
      assert(r.getLong(5) ===
        r.getLong(4) * 1000000L / (r.getLong(1) * llm.Similarity.K),
        s"recall ppm recomputes: $r")
    }
    // probing every cell IS the brute scan: recall must be exactly 1.0
    val full = rows.last
    assert(full.getLong(0) === llm.Similarity.IvfCentroids.toLong)
    assert(full.getLong(5) === 1000000L,
      s"exhaustive probe must reach brute recall: $full")
  }

  test("x_proto_prune: quarter split exact per cluster; membership matches the Lloyd memo") {
    val rows = llm.Similarity.protoPrune(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pruned, kept) = (r.getLong(1), r.getLong(2), r.getLong(5))
      assert(pruned === (n + 3) / 4, s"prune exactly the ceil-quarter: $r")
      assert(pruned + kept === n, s"split partitions the cluster: $r")
      assert(r.getLong(3) >= 0L, s"a pruned witness always exists: $r")
    }
    // cluster sizes and total id mass must agree with the shared final
    // Lloyd assignment (the memoized clustering both consumers read)
    val km = llm.Similarity.kmeansIter(spark, sf).collect()
      .filter(_.getInt(0) == llm.Similarity.KmeansIters)
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(4))).toMap
    assert(rows.length === km.size, "one row per final cluster")
    rows.foreach { r =>
      val (n, sumIds) = km(r.getLong(0))
      assert(r.getLong(1) === n, s"cluster size matches the assignment: $r")
      assert(r.getLong(4) + r.getLong(6) === sumIds, s"id mass conserved: $r")
    }
  }

  test("x_drift: KS statistic exact-integer core matches brute force") {
    val rows = llm.Analytics.drift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, d, ks) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(d >= 0 && d <= na * nb, s"scaled distance within range: $r")
      assert(ks >= 0.0 && ks <= 1.0, s"ks is a probability distance: $r")
      assert(ks == d.toDouble / (na * nb).toDouble, "ks is exactly the one division")
    }
    // brute-force one type on the driver
    val t = rows.head.getString(0)
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull && col("event_type") === t)
      .select((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("cents"),
        pmod(datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))).cast("long"), lit(2L))
          .as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = ev.filter(_._2 == 0L).map(_._1).sorted
    val b = ev.filter(_._2 == 1L).map(_._1).sorted
    val support = (a ++ b).distinct.sorted
    val d = support.map { v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
    }.max
    assert(rows.head.getLong(3) == d && rows.head.getLong(1) == a.length &&
      rows.head.getLong(2) == b.length, s"brute force mismatch for $t")
  }

  test("x_equidepth: bins contiguous, near-equal, and count-conserving") {
    val rows = llm.Analytics.equidepth(spark, sf).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, bins) =>
      assert(bins.map(_.getLong(1)).sorted.toSeq == (1L to 4L), s"$t: 4 dense bins")
      val ns = bins.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$t: equi-depth within one row: ${ns.toSeq}")
      // value ranges must not interleave: bin k's max <= bin k+1's min
      val sorted = bins.sortBy(_.getLong(1))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getLong(4) <= b.getLong(3), s"$t: bins overlap: $a vs $b")
      }
    }
    val total = Tables.events(spark, sf).filter(col("value").isNotNull).count()
    assert(rows.map(_.getLong(2)).sum == total, "every non-null value binned once")
  }

  test("x_stream_enrich: drained stream-static join equals the batch join") {
    val streamed = llm.StreamingOps.streamingEnrich(spark, sf).collect()
    val dim = Tables.events(spark, sf).select(col("event_type")).distinct()
      .withColumn("weight", (length(col("event_type")) % 5 + 1).cast("long"))
    val batch = Tables.events(spark, sf)
      .join(dim, "event_type")
      .groupBy("event_type", "weight")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * col("weight"))
          .cast("double").as("weighted_value"))
      .orderBy("event_type").collect()
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
      "stateless enrichment must be exactly the batch join")
  }

  test("x_decontam_ngram: flagged counts equal the brute-force 8-gram overlap") {
    val rows = llm.Sampling.decontaminationNgram(spark, sf).collect()
    val n = llm.Sampling.DecontamGramN
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        llm.Sampling.splitName(pmod(graft.functions.RollingHash.rolling_hash(col("text")),
          lit(llm.Sampling.SplitBuckets.toLong))).as("split"),
        llm.TextAnalysis.tokens(col("text")).as("toks"))
      .collect()
    def grams(toks: Seq[String]): Set[String] =
      if (toks.length < n) Set.empty else toks.sliding(n).map(_.mkString(" ")).toSet
    val testGrams = docs.filter(_.getString(2) == "test")
      .flatMap(r => grams(r.getSeq[String](3))).toSet
    val expected = docs.filter(_.getString(2) == "train")
      .filter(r => grams(r.getSeq[String](3)).exists(testGrams.contains))
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == expected.getOrElse(r.getString(0), 0L),
        s"flag count disagrees with brute force: $r")
    }
    assert(rows.map(_.getLong(2)).sum == expected.values.sum)
  }

  test("x_bpe_apply: fertility bounds and totals match a driver-side re-tokenization") {
    val rows = llm.TextAnalysis.bpeApply(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (nt, nc, ns, f) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nt <= ns && ns <= nc, s"tokens <= symbols <= chars: $r")
      assert(f == ns.toDouble / nt.toDouble, s"fertility is the one division: $r")
    }
    // re-tokenize one source on the driver with the SAME fixpoint procedure
    val merges = llm.TextAnalysis.bpeMerges(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    def symbols(word: String): Int = {
      var s = " " + word.map(ch => s"$ch ").mkString
      merges.foreach { case (l, r) =>
        (1 to llm.TextAnalysis.BpeReplaceDepth).foreach { _ =>
          s = s.replace(s" $l $r ", s" $l$r ")
        }
      }
      s.trim.split(" ").length
    }
    val src = rows.head.getString(0)
    val toks = Tables.documents(spark, sf).filter(col("source") === src)
      .select(explode(llm.TextAnalysis.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
    assert(rows.head.getLong(3) == toks.map(symbols).map(_.toLong).sum,
      s"$src symbol total must match the sequential re-tokenization")
  }

  test("plan lint: no cartesian blowups or fixture-scale global windows in ANY registered query") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    // Unpartitioned windows documented as bounded-input at their def
    // sites — every other query must window over a partition key:
    //   q_join_fx_asof     — forward-fill over the ~2.4k-row date DIM
    //   q_join_fx_asof_tol — same dim-side fill, plus its staleness track
    //   q_csv              — corrupt-count total over the ≤5-row AGGREGATED frame
    //   x_interleave       — dense_rank over the DISTINCT sources (a handful)
    //   x_bootstrap        — CI rank over the B=64 REPLICATE rows (replicate-
    //                        sized by construction, never data-sized)
    //   x_survival         — suffix risk-set window over the ≤horizon-days
    //                        lifetime domain (calendar-bounded; appears twice
    //                        because the risk frame feeds both output and the
    //                        collected step list)
    val globalWindowOk =
      Set("q_join_fx_asof", "q_join_fx_asof_tol", "q_csv", "x_interleave",
        "x_bootstrap", "x_survival",
        // x_theilsen: both global windows rank CALENDAR-bounded frames
        // (day pairs / per-day residuals), never fact-sized ones
        "x_theilsen",
        // x_hybrid_rrf: all three global windows are RANK-bounded — two
        // rank the ≤Bm25TopK-row ranker lists, the third re-ranks the
        // ≤2·Bm25TopK fused candidates (the hybrid call has one implicit
        // query, so there is no partition key BY DESIGN; corpus-sized
        // work lives inside the rankers, which keep their own shapes)
        "x_hybrid_rrf")
    // streaming queries execute their stream at construction — covered by
    // their own specs; the lint targets the batch plan surface.
    // x_global_ids is OPAQUE to a logical lint: its output is an eager
    // localCheckpoint, so the optimized plan is a bare LogicalRDD — its
    // scale shape is instead pinned by its dedicated spec (bit-equality
    // with the window formulation + the loud dense-permutation gate).
    // Condition-free joins documented as model-sized at their def sites:
    //   x_sim_pq_serve / x_sim_filtered / x_ann_compact — the coarse-probe
    //     scoring q × cents is queries × CENTROIDS (the dim-sized IVF
    //     model, never the corpus); the engine rungs do the identical
    //     work as a broadcast centroid-ARRAY fold (centArr), a shape this
    //     lint can't see either — the SQL face just makes it explicit,
    //     and it collapses to NumProbes rows per query immediately after
    //   x_maxsim — the MaxSim scoring join is doc-tokens × the broadcast
    //     QUERY (≤ MaxSimQTokens = 8 rows by GlobalLimit; maxRows > 1 so
    //     the one-row idiom can't prove it) — the late-interaction serve
    //     shape: query tokens broadcast, corpus streams map-side
    //   x_knn_classify — corpus-side labeled pool × the broadcast QUERY
    //     BATCH (the strided classify sample; model-sized by construction,
    //     documented at the def site) — same broadcast-query-batch shape
    val cartesianOk =
      Set("x_sim_pq_serve", "x_sim_filtered", "x_sim_filtered_pq",
        "x_ann_compact", "x_ann_delete", "x_maxsim", "x_knn_classify")
    val skip = SparkEntry.queries.keySet.filter(_.contains("stream")) + "x_global_ids"
    val violations = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => skip(q._1)).flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        // a condition-free join is a cartesian UNLESS one side is bounded
        // to a single row (the broadcast-one-row-aggregate idiom Catalyst
        // proves via maxRows — the documented stat-join pattern)
        val crosses = if (cartesianOk(name)) Nil else plan.collect {
          case j: Join if j.condition.isEmpty &&
            !j.left.maxRows.exists(_ <= 1L) && !j.right.maxRows.exists(_ <= 1L) => j
        }
        val gwins =
          if (globalWindowOk(name)) Nil
          else plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        (if (crosses.nonEmpty) Seq(s"$name: ${crosses.size} unbounded cartesian join(s)")
         else Nil) ++
          (if (gwins.nonEmpty) Seq(s"$name: ${gwins.size} unpartitioned window(s)") else Nil)
      }
    assert(violations.isEmpty,
      s"scale-hostile plan shapes detected:\n${violations.mkString("\n")}")
  }

  /** The 25 most expensive non-streaming queries of BENCH_r12 — the tail
    * whose plan shape regressions (broadcast→SMJ demotion, lost pushdown,
    * extra exchange) would otherwise surface only as bench drift.
    */
  private val planManifestTargets = Seq(
    "x_kcore", "x_pagerank", "x_closeness", "x_lsh_recall", "x_bm25",
    "x_connected", "x_marginal_coverage", "x_triangles", "x_basket",
    "x_range_join", "x_shortest_path", "x_kmv", "x_modularity", "q_rollup",
    "x_kcenter", "q_window", "x_link_pred", "q_window_native", "x_ngram_lm",
    "q_join_fx_asof", "x_eval_metrics", "x_scd2_join", "x_rfm", "x_tfidf",
    "x_path_topk",
    // round-14 batch additions worth pinning (streaming queries can't
    // fingerprint — their work happens inside foreachBatch)
    "x_mm_pipeline", "x_sim_filtered", "x_contrastive", "x_ann_rebalance",
    "x_clean_split",
    // round-15: the graph index family joined the expensive tail. Only
    // the (unmemoized) stats report is fingerprinted — the search rung's
    // frame is memo-cached and its fingerprint flickers by a few nodes
    // with suite-incidental cache state; its shape is pinned instead by
    // its own spec (TopKPerKey bounds + no cartesian + beam bounds).
    "x_knngraph_stats")

  private val planMetrics = Seq("shuffles", "broadcasts", "sorts",
    "sort_merge_joins", "broadcast_hash_joins", "shuffled_hash_joins",
    "nested_loop_joins", "cartesians", "pushed_filter_scans")

  private def planFingerprint(name: String): Map[String, Int] = {
    val p = SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    def c(sub: String): Int = {
      var n = 0; var i = p.indexOf(sub)
      while (i >= 0) { n += 1; i = p.indexOf(sub, i + 1) }
      n
    }
    Map(
      "shuffles" -> (c("Exchange hashpartitioning") +
        c("Exchange rangepartitioning") + c("Exchange SinglePartition")),
      "broadcasts" -> c("BroadcastExchange"),
      "sorts" -> c("Sort ["),
      "sort_merge_joins" -> c("SortMergeJoin"),
      "broadcast_hash_joins" -> c("BroadcastHashJoin"),
      "shuffled_hash_joins" -> c("ShuffledHashJoin"),
      "nested_loop_joins" -> c("BroadcastNestedLoopJoin"),
      "cartesians" -> c("CartesianProduct"),
      "pushed_filter_scans" -> (c("PushedFilters: [") - c("PushedFilters: []")))
  }

  test("plan manifest: expensive-tail plan shapes match PLAN_MANIFEST.json") {
    // A checked-in fingerprint (node counts of the STATIC physical plan at
    // the spec fixture) per expensive query: a broadcast→SMJ demotion, a
    // lost parquet pushdown, or a new exchange now fails `sbt test`
    // instead of surfacing as bench drift.
    //
    // Condition-independence: the fingerprints legitimately depend on the
    // shared memo caches being MATERIALIZED (post-materialization
    // statistics feed join-strategy choices — the warm state is the
    // realistic one at serving time), so before fingerprinting, every
    // target query is executed once. Under the full suite that warm-up is
    // a no-op (earlier specs already materialized the memos); under an
    // isolated `testOnly -z "plan manifest"` it brings the caches to the
    // SAME state, so the fingerprint no longer depends on run order.
    // Intentional plan changes regenerate the manifest in the same commit:
    //   GRAFT_UPDATE_PLAN_MANIFEST=1 sbt test
    //
    // The warm-up is UNCONDITIONAL: round 15 measured that skipping it
    // under the full suite (the round-14 wall-clock optimization) lets
    // suite-incidental cache state leak into the fingerprints — x_basket
    // and x_kmv fingerprinted differently under `sbt test` vs an isolated
    // invocation. Re-executing every target right before fingerprinting
    // is the one state both run modes provably share; the ~25 extra
    // query executions are the price of a run-order-independent gate.
    planManifestTargets.foreach(n => SparkEntry.queries(n)(spark, sf).count())
    val path = java.nio.file.Paths.get("PLAN_MANIFEST.json")
    val current = planManifestTargets.map(n => n -> planFingerprint(n))
    def render: String = current.map { case (n, m) =>
      s"""  "$n": {""" +
        planMetrics.map(k => s""""$k": ${m(k)}""").mkString(", ") + "}"
    }.mkString("{\n", ",\n", "\n}\n")
    if (sys.env.contains("GRAFT_UPDATE_PLAN_MANIFEST")) {
      java.nio.file.Files.writeString(path, render)
      info(s"regenerated $path")
    } else {
      assert(java.nio.file.Files.exists(path),
        "PLAN_MANIFEST.json missing — regenerate with GRAFT_UPDATE_PLAN_MANIFEST=1")
      val txt = java.nio.file.Files.readString(path)
      val entry = """"([a-z0-9_]+)": \{([^}]*)\}""".r
      val kv = """"([a-z_]+)": (\d+)""".r
      val recorded = entry.findAllMatchIn(txt).map { m =>
        m.group(1) -> kv.findAllMatchIn(m.group(2))
          .map(g => g.group(1) -> g.group(2).toInt).toMap
      }.toMap
      val diffs = current.flatMap { case (n, m) =>
        recorded.get(n) match {
          case None => Seq(s"$n: missing from manifest")
          case Some(r) => planMetrics.flatMap { k =>
            if (r.getOrElse(k, -1) != m(k))
              Some(s"$n.$k: manifest ${r.getOrElse(k, -1)} != current ${m(k)}")
            else None
          }
        }
      }
      assert(diffs.isEmpty,
        s"plan shapes drifted from PLAN_MANIFEST.json (regenerate ONLY if " +
          s"intentional):\n${diffs.mkString("\n")}")
    }
  }

  test("artifact freshness: the latest sf0.1 correctness artifact covers the FULL registry") {
    // The round-13 lesson — sf0.1 catches what smaller SFs cannot (the
    // x_stream_join_outer watermark-pushdown bug) — is only banked if the
    // recorded artifact always covers every registered query. Round 14
    // shipped 3 queries AFTER recording its artifact; this guard fails
    // the suite whenever queries land without re-recording
    // CORRECTNESS_SF01_r{N}.json (verdict r14 finding #1).
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(".")
    val listing = java.nio.file.Files.list(dir)
    val arts =
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(_.matches("CORRECTNESS_SF01_r\\d+\\.json")).toSeq
      finally listing.close()
    assert(arts.nonEmpty, "no CORRECTNESS_SF01_r*.json artifact recorded")
    val latest =
      arts.maxBy(n => "_r(\\d+)\\.json$".r.findFirstMatchIn(n).get.group(1).toInt)
    val txt = new String(
      java.nio.file.Files.readAllBytes(dir.resolve(latest)),
      java.nio.charset.StandardCharsets.UTF_8)
    // top-level keys: every query name opens an object; record fields are
    // scalars, so name-then-brace only matches query rows
    val keys = "\"([a-z0-9_]+)\"\\s*:\\s*\\{".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    val registry = SparkEntry.queries.keySet
    assert(keys == registry,
      s"$latest is stale vs the registry: missing=${(registry -- keys).toSeq.sorted}, " +
        s"extra=${(keys -- registry).toSeq.sorted} — re-record at sf0.1 " +
        "(graft.Verify + tools/check.py) before shipping")
    // and every recorded row must be green (no false flags, no errs)
    assert(!txt.contains("false"), s"$latest records a non-green row")
  }

  test("SURVEY audit: every registered query maps 1:1 to a named SURVEY.md ID") {
    // SURVEY §2 claims a provably exhaustive inventory; this pins it
    // mechanically — every SparkEntry.queries entry must name its SURVEY
    // ID here, and that ID literal must exist in SURVEY.md. A new query
    // without a SURVEY row (or a SURVEY rename that orphans a query)
    // fails this test, not a judge read-through.
    val idOf = Map(
      "q_load_fb" -> "Q-LOAD-FB", "q_load_fx" -> "Q-LOAD-FX",
      "q_join_fx" -> "Q-JOIN-FX", "q_join_fx_asof" -> "Q-JOIN-FX-ASOF",
      "q_unnest" -> "Q-UNNEST", "q_daily" -> "Q-DAILY",
      "q_topk" -> "Q-TOPK", "q_window" -> "Q-WINDOW",
      "q_window_native" -> "Q-WINDOW", "q_rollup" -> "Q-ROLLUP",
      "q_prune" -> "Q-PRUNE", "q_idem" -> "Q-IDEM",
      "q_msg" -> "S-MSG", "q_trigger_date" -> "T-DATE",
      "q_fx_gate" -> "K-GATE", "q_dsv2" -> "S-FB",
      "q_sink_dsv2" -> "Q-SINK-DSV2", "q_dsv2_agg" -> "Q-DSV2-AGG",
      "q_dsv2_sql" -> "Q-DSV2-SQL", "q_stream_load" -> "Q-STREAM-LOAD",
      "q_stream_dsv2" -> "Q-STREAM-DSV2", "q_stream_sink" -> "Q-STREAM-SINK",
      "q_sql" -> "Q-SQL", "q_compact" -> "Q-COMPACT", "q_merge" -> "Q-MERGE",
      "q_delete" -> "Q-DELETE", "q_csv" -> "Q-LOAD-CSV", "q_orc" -> "Q-LOAD-ORC",
      "x_text_stats" -> "X-TEXT", "x_token_count" -> "X-TOKEN-COUNT",
      "x_lang_id" -> "X-LANG-ID", "x_fingerprint" -> "X-FINGERPRINT",
      "x_quality_filter" -> "X-QUALITY-FILTER", "x_vocab" -> "X-VOCAB",
      "x_text_norm" -> "X-TEXT-NORM", "x_tfidf" -> "X-TFIDF",
      "x_bm25" -> "X-BM25", "x_pii" -> "X-PII", "x_chunk" -> "X-CHUNK",
      "x_ngram_lm" -> "X-NGRAM-LM", "x_diversity" -> "X-DIVERSITY",
      "x_dedup_exact" -> "X-DEDUP", "x_dedup_minhash" -> "X-DEDUP",
      "x_dedup_simhash" -> "X-DEDUP", "x_ngram_jaccard" -> "X-DEDUP",
      "x_dedup_pipeline" -> "X-DEDUP", "x_dedup_embed" -> "X-DEDUP-EMBED",
      "x_source_sim" -> "X-SOURCE-SIM", "x_semdedup" -> "X-SEMDEDUP",
      "x_connected" -> "X-CONNECTED", "x_graph_degree" -> "X-GRAPH-DEGREE",
      "x_sim_brute" -> "X-SIM", "x_sim_lsh" -> "X-SIM", "x_sim_ivf" -> "X-SIM",
      "x_kmeans" -> "X-KMEANS", "x_kmeans_iter" -> "X-KMEANS-ITER",
      "x_vec_avg" -> "X-VEC-AVG",
      "x_mm_meta" -> "X-MM", "x_mm_features" -> "X-MM", "x_mm_frames" -> "X-MM",
      "x_events_daily" -> "X-EVENTS", "x_events_sessions" -> "X-EVENTS",
      "x_latest" -> "X-LATEST", "x_funnel" -> "X-FUNNEL",
      "x_retention" -> "X-RETENTION", "x_sliding" -> "X-SLIDING",
      "x_pivot" -> "X-PIVOT", "x_unpivot" -> "X-UNPIVOT", "x_cube" -> "X-CUBE",
      "x_quantiles" -> "X-QUANTILES", "x_window_range" -> "X-WINDOW-RANGE",
      "x_hll" -> "X-HLL", "x_hll_merge" -> "X-HLL-MERGE",
      "x_histogram" -> "X-HISTOGRAM", "x_incr_agg" -> "X-INCR-AGG",
      "x_overlap" -> "X-OVERLAP", "x_anomaly" -> "X-ANOMALY", "x_mad" -> "X-MAD",
      "x_heavy_hitters" -> "X-HEAVY-HITTERS", "x_cms" -> "X-CMS",
      "x_stream_daily" -> "X-STREAM", "x_stream_sessions" -> "X-STREAM",
      "x_stream_sessions_inc" -> "X-STREAM-SESSIONS-INC",
      "x_stream_dedup" -> "X-STREAM-DEDUP", "x_stream_join" -> "X-STREAM-JOIN",
      "x_stream_upsert" -> "X-STREAM-UPSERT",
      "x_split" -> "X-SAMPLE", "x_token_budget" -> "X-SAMPLE",
      "x_decontam" -> "X-DECONTAM", "x_stratified" -> "X-STRATIFIED",
      "x_pack" -> "X-PACK", "x_interleave" -> "X-INTERLEAVE",
      "x_skew_salted" -> "X-SKEW", "x_skew_join" -> "X-SKEW",
      "x_range_join" -> "X-RANGE", "x_zorder" -> "X-ZORDER",
      "x_file_skip" -> "X-FILE-SKIP",
      "x_bloom_join" -> "X-BLOOM-JOIN", "x_bucket_join" -> "X-BUCKET-JOIN",
      "x_scd2" -> "X-SCD2", "x_time_travel" -> "X-TIME-TRAVEL",
      "x_vacuum" -> "X-VACUUM", "q_evolve" -> "Q-SCHEMA-EVOLVE",
      "x_change_feed" -> "X-CHANGE-FEED", "x_embed_quant" -> "X-EMBED-QUANT",
      "x_sim_multiprobe" -> "X-SIM", "x_sim_ivfpq" -> "X-SIM-IVFPQ", "x_sim_incr" -> "X-SIM-INCR", "x_sim_rrf" -> "X-RRF",
      "x_sim_knngraph" -> "X-SIM-KNNGRAPH", "x_knngraph_stats" -> "X-KNNGRAPH-STATS",
      "x_hybrid_rrf" -> "X-HYBRID-RRF",
      "x_rank_metrics" -> "X-RANK-METRICS", "x_kcenter" -> "X-KCENTER",
      "x_mmr" -> "X-MMR", "x_pr_curve" -> "X-PR-CURVE",
      "x_kanon" -> "X-KANON", "x_priority_sample" -> "X-PRIORITY-SAMPLE",
      "x_group_split" -> "X-GROUP-SPLIT", "x_rebalance" -> "X-REBALANCE",
      "x_changepoint" -> "X-CHANGEPOINT", "x_autocorr" -> "X-AUTOCORR",
      "x_did" -> "X-DID", "x_bootstrap" -> "X-BOOTSTRAP",
      "x_rand_proj" -> "X-RANDPROJ", "x_conformal" -> "X-CONFORMAL",
      "x_labelprop" -> "X-LABELPROP",
      "x_stream_anomaly" -> "X-STREAM-ANOMALY", "x_pca" -> "X-PCA",
      "x_survival" -> "X-SURVIVAL", "x_cuped" -> "X-CUPED",
      "x_canonical" -> "X-CANONICAL", "x_hubness" -> "X-HUBNESS",
      "x_hash_features" -> "X-HASH-FEATURES",
      "x_chi2_drift" -> "X-CHI2-DRIFT",
      "x_mann_whitney" -> "X-MANN-WHITNEY", "x_theilsen" -> "X-THEILSEN",
      "x_path_topk" -> "X-PATH-TOPK", "x_join_card" -> "X-JOIN-CARD",
      "x_temp_mix" -> "X-TEMP-MIX", "x_containment" -> "X-CONTAINMENT",
      "x_mm_dedup" -> "X-MM-DEDUP", "x_kcore" -> "X-KCORE",
      "x_link_pred" -> "X-LINK-PRED", "x_stream_kmv" -> "X-STREAM-KMV",
      "x_mm_neardup" -> "X-MM-NEARDUP", "x_sim_pq_serve" -> "X-SIM-PQ-SERVE",
      "q_idem_keyed" -> "Q-IDEM-KEYED", "x_mm_pipeline" -> "X-MM-PIPELINE",
      "x_mm_text_join" -> "X-MM-TEXT-JOIN",
      "x_stream_neardup" -> "X-STREAM-NEARDUP", "x_stream_sim" -> "X-STREAM-SIM",
      "x_stream_ann_delete" -> "X-STREAM-ANN-DELETE",
      "x_sim_filtered" -> "X-SIM-FILTERED", "x_ann_compact" -> "X-ANN-COMPACT",
      "x_contrastive" -> "X-CONTRASTIVE", "x_ann_stats" -> "X-ANN-STATS",
      "x_curriculum" -> "X-CURRICULUM", "x_ann_delete" -> "X-ANN-DELETE",
      "q_roas" -> "Q-ROAS", "x_clean_split" -> "X-CLEAN-SPLIT",
      "x_ann_rebalance" -> "X-ANN-REBALANCE",
      "x_sim_filtered_pq" -> "X-SIM-FILTERED-PQ", "x_stream_mm" -> "X-STREAM-MM",
      "x_mm_cluster" -> "X-MM-CLUSTER", "x_quantile_sketch" -> "X-QUANTILE-SKETCH",
      "x_ltv" -> "X-LTV", "x_time_to_convert" -> "X-TIME-TO-CONVERT",
      "x_ab_srm" -> "X-AB-SRM", "x_bloom_fpr" -> "X-BLOOM-FPR",
      "x_marginal_coverage" -> "X-MARGINAL-COVERAGE",
      "x_impute" -> "X-IMPUTE", "x_target_enc" -> "X-TARGET-ENC",
      "x_closeness" -> "X-CLOSENESS", "x_modularity" -> "X-MODULARITY",
      "x_lsh_curve" -> "X-LSH-CURVE", "x_ab_power" -> "X-AB-POWER",
      "x_mm_resize" -> "X-MM-RESIZE",
      "x_profile" -> "X-PROFILE",
      "x_pagerank" -> "X-PAGERANK", "x_grouping_sets" -> "X-GROUPING-SETS",
      "x_window_funcs" -> "X-WINDOW-FUNCS", "x_cooccur" -> "X-COOCCUR",
      "x_sample_topk" -> "X-SAMPLE-TOPK", "x_rep_ngram" -> "X-REP-NGRAM",
      "x_gopher" -> "X-GOPHER", "x_triangles" -> "X-TRIANGLES",
      "x_global_ids" -> "X-GLOBAL-IDS", "x_fuzzy_join" -> "X-FUZZY-JOIN",
      "x_transitions" -> "X-TRANSITIONS",
      "q_join_fx_asof_tol" -> "Q-JOIN-FX-ASOF-TOL", "x_decay" -> "X-DECAY",
      "x_optout" -> "X-OPTOUT", "x_boilerplate" -> "X-BOILERPLATE",
      "x_vocab_coverage" -> "X-VOCAB-COVERAGE",
      "x_shortest_path" -> "X-SHORTEST-PATH", "x_rfm" -> "X-RFM",
      "x_dsir" -> "X-DSIR", "x_mixture" -> "X-MIXTURE",
      "x_shard_manifest" -> "X-SHARD", "x_novelty" -> "X-NOVELTY",
      "x_bpe" -> "X-BPE", "x_gini" -> "X-GINI", "x_drift" -> "X-DRIFT",
      "x_embed_drift" -> "X-EMBED-DRIFT",
      "x_freshness" -> "X-FRESHNESS",
      "x_soft_dedup" -> "X-SOFT-DEDUP",
      "x_knn_classify" -> "X-KNN-CLASSIFY",
      "x_proto_prune" -> "X-PROTO-PRUNE",
      "x_ann_curve" -> "X-ANN-CURVE",
      "x_dataset_card" -> "X-DATASET-CARD",
      "x_stream_pipeline" -> "X-STREAM-PIPELINE",
      "x_maxsim" -> "X-MAXSIM",
      "x_betweenness" -> "X-BETWEENNESS",
      "x_equidepth" -> "X-EQUIDEPTH", "x_stream_enrich" -> "X-STREAM-ENRICH",
      "x_attrib_last" -> "X-ATTRIB-LAST", "x_attrib_pos" -> "X-ATTRIB-POS",
      "x_stream_attrib" -> "X-STREAM-ATTRIB",
      "x_attrib_decay" -> "X-ATTRIB-DECAY",
      "x_incr_join" -> "X-INCR-JOIN",
      "x_interval_merge" -> "X-INTERVAL-MERGE", "x_freq_cap" -> "X-FREQ-CAP",
      "x_decontam_ngram" -> "X-DECONTAM-NGRAM", "x_bpe_apply" -> "X-BPE-APPLY",
      "x_linreg" -> "X-LINREG", "x_winsorize" -> "X-WINSORIZE",
      "x_observe" -> "X-OBSERVE", "x_gapfill" -> "X-GAPFILL",
      "x_bitmap_distinct" -> "X-BITMAP-DISTINCT", "x_kmv" -> "X-KMV",
      "x_dup_spans" -> "X-DUP-SPANS",
      "x_dup_spans_cut" -> "X-DUP-SPANS-CUT",
      "x_dedup_cluster" -> "X-DEDUP-CLUSTER",
      "x_stream_join_outer" -> "X-STREAM-JOIN-OUTER",
      "x_basket" -> "X-BASKET", "x_ab_test" -> "X-AB-TEST",
      "x_skyline" -> "X-SKYLINE", "x_eval_metrics" -> "X-EVAL-METRICS",
      "x_json_extract" -> "X-JSON-EXTRACT", "x_cohort" -> "X-COHORT",
      "x_star_join" -> "X-STAR-JOIN", "x_lsh_recall" -> "X-LSH-RECALL",
      "x_stream_late" -> "X-STREAM-LATE",
      "x_expectations" -> "X-EXPECTATIONS",
      "x_sessions_dynamic" -> "X-SESSIONS-DYNAMIC",
      "x_dedup_incr" -> "X-DEDUP-INCR", "x_pipeline" -> "X-PIPELINE",
      "q_dsv2_fn" -> "Q-DSV2-FN", "q_dsv2_aggfn" -> "Q-DSV2-AGGFN",
      "x_dau" -> "X-DAU",
      "x_seasonality" -> "X-SEASONALITY", "x_scd2_join" -> "X-SCD2-JOIN")
    val registered = SparkEntry.queries.keySet
    val unmapped = registered -- idOf.keySet
    assert(unmapped.isEmpty, s"queries with no SURVEY ID mapping: $unmapped")
    val stale = idOf.keySet -- registered
    assert(stale.isEmpty, s"audit map names unregistered queries: $stale")
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    // word-boundary match so e.g. X-SIM doesn't vacuously match X-SIMHASH
    val missing = idOf.values.toSet.filterNot(id =>
      s"(?<![A-Z0-9-])${java.util.regex.Pattern.quote(id)}(?![A-Z0-9-])".r
        .findFirstIn(survey).isDefined)
    assert(missing.isEmpty, s"SURVEY.md has no row for: $missing")
  }

  test("AQE equivalence: every registered query returns identical rows with AQE on and off") {
    // the cheap way to catch plan-sensitive determinism bugs before a
    // cluster does: AQE re-plans at runtime (coalesced exchanges, skew
    // splits, runtime join demotion) — a query whose VALUES depend on the
    // physical plan (partition ids, non-total orders, float re-association)
    // diverges here long before a 1000-executor run re-plans it for real.
    // Rows compare as sorted strings — the driver's hash gate sorts too.
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    try {
      val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val off = canon(fn(spark, sf))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        val on = canon(fn(spark, sf))
        if (off != on) diffs += name
      }
      assert(diffs.isEmpty, s"AQE-sensitive queries: ${diffs.mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("ts vintage invariance: long-nanos / NTZ / timestamp fixtures give identical results") {
    // the driver's fixture has shipped events.ts as parquet TIMESTAMP
    // (µs), TIMESTAMP_NTZ and raw int64 NANOS across rounds — a vintage
    // switch once broke 34 queries at the driver. Stage the SAME rows in
    // all three physical types (the nanos copy carries nonzero sub-µs
    // digits to exercise truncation) and assert representative
    // event-time operators are bit-identical across them.
    val tmp = java.nio.file.Files.createTempDirectory("graft_vintage_")
    val base = graft.Tables.events(spark, sf)
    base.write.parquet(s"$tmp/ts/events.parquet")
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$tmp/ntz/events.parquet")
    base.withColumn("ts",
        unix_micros(col("ts")) * 1000L + pmod(col("event_id"), lit(997L)))
      .write.parquet(s"$tmp/nanos/events.parquet")
    def results(dir: String): Seq[Seq[org.apache.spark.sql.Row]] = Seq(
      graft.llm.Events.latest(spark, dir).collect().toSeq,
      graft.llm.Attribution.lastTouch(spark, dir).collect().toSeq,
      graft.llm.Attribution.intervalMerge(spark, dir).collect().toSeq)
    try {
      val Seq(rTs, rNtz, rNanos) =
        Seq("ts", "ntz", "nanos").map(v => results(s"$tmp/$v"))
      assert(rTs == rNtz, "NTZ vintage diverged from the timestamp vintage")
      assert(rTs == rNanos, "nanos vintage diverged from the timestamp vintage")
    } finally graft.streaming.Drain.deleteRecursively(tmp)
  }

  test("x_stream_attrib recovery: the last-touch state survives a query restart") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_attrib_restart_").toString
    val (src, out, ckpt) = (dir + "/in", dir + "/out", dir + "/ckpt")
    val t0 = 1700000000000000L // any epoch micros
    def write(rows: Seq[(Long, Long, Long, String, Long)]): Unit =
      rows.toDF("user_id", "us", "event_id", "event_type", "cents")
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val ds = spark.readStream
        .schema("user_id LONG, us LONG, event_id LONG, event_type STRING, cents LONG")
        .parquet(src)
        .withColumn("ts", timestamp_micros(col("us")))
        .withWatermark("ts", "1 hour")
        .as[(Long, Long, Long, String, Long, java.sql.Timestamp)]
      val q = graft.llm.Attribution.attributeStream(ds)
        .toDF("user_id", "channel", "cents")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    try {
      // run 1: a click only — no output, but the touch must land in the
      // state store
      write(Seq((1L, t0, 1L, "click", 0L)))
      runOnce()
      // run 2 (RESTARTED query, same checkpoint): a purchase an hour
      // later attributes to the click ONLY if the state survived the
      // restart; user 2's purchase has no touch and must report `none`
      write(Seq(
        (1L, t0 + 3600000000L, 2L, "purchase", 500L),
        (2L, t0 + 3600000000L, 3L, "purchase", 70L)))
      runOnce()
      val rows = spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set((1L, "click", 500L), (2L, "none", 70L)),
        s"state did not survive the restart: $rows")
    } finally graft.streaming.Drain.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("X-FILE-SKIP: the manifest drops files and skipping changes no values") {
    val (df, read, total) = graft.queries.ScaleQueries.fileSkipAudit(spark, sf)
    assert(read < total, s"no files skipped: read $read of $total")
    assert(read > 0, "the selected range must match at least one file")
    // value identity vs the plain whole-table filter (the oracle's view)
    val ev = graft.Tables.events(spark, sf)
    val maxU = ev.agg(max("user_id")).head().getLong(0)
    val expected = ev
      .filter(col("user_id") >= maxU / 4 && col("user_id") <= maxU / 2)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"),
        sum((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")).as("value_cents"))
      .orderBy("event_type").collect().toSeq
    assert(df.collect().toSeq == expected, "pruned scan changed values")
  }

  test("Q-DSV2-AGGFN: the catalog aggregate runs as a PARTIAL aggregate") {
    val plan = graft.queries.EtlQueries.qDsv2AggFn(spark, sf)
      .queryExecution.executedPlan.toString
    // mergeable state must buy map-side combine: a partial v2aggregator
    // below the exchange, the final one above it
    assert(plan.contains("partial_v2aggregator"),
      s"catalog aggregate did not run partially:\n${plan.take(2000)}")
  }

  // ---- X-ATTRIB / X-INTERVAL-MERGE conservation laws ------------------

  test("X-ATTRIB: last-touch and U-shaped credit both partition purchases exactly") {
    val purchases = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).cast("long"),
        sum((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")))
      .head()
    val (nConv, cents) = (purchases.getLong(0), purchases.getLong(1))

    val lastAgg = graft.llm.Attribution.lastTouch(spark, sf)
      .agg(sum("n_conv"), sum("revenue_cents")).head()
    assert(lastAgg.getLong(0) === nConv)
    assert(lastAgg.getLong(1) === cents)

    // ppm conservation is EXACT (1e6 per conversion) and cents
    // conservation is EXACT (floor shares + shortfall cents): the
    // largest-remainder arithmetic must never leak or double-count
    val posAgg = graft.llm.Attribution.positionCredit(spark, sf)
      .agg(sum("credit_ppm"), sum("credit_cents")).head()
    assert(posAgg.getLong(0) === 1000000L * nConv)
    assert(posAgg.getLong(1) === cents)

    val decayAgg = graft.llm.Attribution.timeDecayCredit(spark, sf)
      .agg(sum("credit_ppm"), sum("credit_cents")).head()
    assert(decayAgg.getLong(0) === 1000000L * nConv)
    assert(decayAgg.getLong(1) === cents)
  }

  test("X-ATTRIB/X-INTERVAL-MERGE plan shape: the facts shuffle ONCE by user") {
    // lastTouch: one user exchange for the fill-down window; the channel
    // rollup afterwards exchanges a ≤3-row aggregate, never the facts
    val lastPlan = graft.llm.Attribution.lastTouch(spark, sf)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(lastPlan).size == 1,
      s"lastTouch must exchange by user exactly once:\n${lastPlan.take(2000)}")
    // intervalMerge: the user exchange feeds both windows AND both
    // rollups — HashPartitioning(user_id) satisfies the (user_id, isl)
    // clustering, so no second fact-sized exchange appears
    val mergePlan = graft.llm.Attribution.intervalMerge(spark, sf)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(mergePlan).size == 1,
      s"intervalMerge must exchange by user exactly once:\n${mergePlan.take(2000)}")
  }

  test("X-INTERVAL-MERGE: island counts and coverage respect interval bounds") {
    val iv = graft.llm.Attribution.ActivityIntervalUs
    val rows = graft.llm.Attribution.intervalMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nIsl, covered, longest, nEv) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(nIsl >= 1L && nIsl <= nEv)
      // each island spans at least one interval; coverage can never
      // exceed one interval per event (merging only shrinks coverage)
      assert(covered >= nIsl * iv)
      assert(covered <= nEv * iv)
      assert(longest >= iv && longest <= covered)
    }
    // total event count conservation vs the raw table
    val totalEv = rows.map(_.getLong(4)).sum
    assert(totalEv === graft.Tables.events(spark, sf).count())
  }
}
