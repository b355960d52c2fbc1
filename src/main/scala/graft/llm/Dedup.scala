package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.RollingHash.rolling_hash

/** X-DEDUP (SURVEY.md §2.7): exact and near-duplicate detection over the
  * `documents` table — the core of any large-scale training-data pipeline.
  *
  * Scale design: every variant avoids the O(n²) all-pairs comparison.
  *  - exact: group by an 8-byte rolling-hash key (not the full text) —
  *    the shuffle moves hashes, not documents;
  *  - MinHash + LSH: shingle → 64-slot signature → 16 banded hash keys →
  *    pairs only within band buckets (standard banding: docs with Jaccard
  *    ≥ ~0.5 collide in ≥1 band w.h.p.);
  *  - SimHash: 64-bit fingerprint, banded into 4×16-bit keys, Hamming
  *    filter on candidates;
  *  - n-gram Jaccard: exact verification on a *bounded* candidate set.
  * All signature math is built-in expressions (codegen), no UDFs.
  */
object Dedup {

  // ---- exact ----------------------------------------------------------

  /** Exact dedup: hash-group on the rolling-hash of normalized text, keep
    * the smallest doc_id per group. Output one row per distinct text with
    * its duplicate count — SQL-oracle-checkable.
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), length(col("text")).cast("long").as("n_chars"))
      .orderBy("keep_id")

  // ---- MinHash + LSH --------------------------------------------------

  val NumHashes: Int = graft.functions.MinHashSig.NumHashes
  val NumBands = 16
  val RowsPerBand: Int = NumHashes / NumBands
  val ShingleK = 8

  /** Shingle hash domain [0, 2^32) — see [[graft.functions.MinHashSig]]
    * for the ANSI-safe permutation arithmetic.
    */
  val HashDomain: Long = 1L << 32

  /** Character k-shingles of `c`, hashed into [0, 2^32) via xxhash64 —
    * one pass, distinct. Empty for texts shorter than k.
    */
  def shingleHashes(c: Column, k: Int = ShingleK): Column = {
    val idx = when(length(c) >= k, sequence(lit(1), length(c) - (k - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i => pmod(xxhash64(c.substr(i, lit(k))), lit(HashDomain))))
  }

  /** 64-slot MinHash signature: sig_i = min over shingles of
    * (a_i*h + b_i) mod P — the native codegen'd kernel
    * ([[graft.functions.MinHashSig]]); the equivalent higher-order-function
    * expression allocated an array per permutation per row and benched
    * 10× slower at sf0.1.
    */
  def minhashSignature(c: Column): Column = {
    val hs = shingleHashes(c)
    when(size(hs) > 0, graft.functions.MinHashSig.minhash_sig(hs))
  }

  /** doc_id → signature, cached: the pair-generation self-join and the
    * estimate join both reuse it (at 100 TB this is a persisted signature
    * table, not a recomputation per consumer).
    */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingleHashes(col("text")).as("hs"))
      .filter(size(col("hs")) > 0) // shingle-less docs have no signature
      .select(col("doc_id"), graft.functions.MinHashSig.minhash_sig(col("hs")).as("sig"))
      .cache()

  private val sigCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Memoized per (session, sfDir): `.cache()` on a freshly-built plan is
    * a NEW cache entry — consumers (minhashPairs, dedupPipeline) must
    * share one DataFrame instance or each recomputes the signatures.
    */
  def signatureTable(spark: SparkSession, sfDir: String): DataFrame =
    sigCache.computeIfAbsent((spark, sfDir),
      _ => signatures(Tables.documents(spark, sfDir)))

  /** LSH banding: 16 (band, bandKey) rows per doc; candidate pairs are
    * doc pairs sharing ≥1 band key. The self-join is on the banded key —
    * shuffle is by (band, key), never all-pairs.
    */
  def candidatePairs(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(NumBands - 1)), j =>
        struct(j.as("band"), xxhash64(slice(col("sig"), j * RowsPerBand + 1, lit(RowsPerBand))).as("bkey"))))
        .as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bkey"))
    val l = bands.as("l")
    val r = bands.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
  }

  /** X-DEDUP MinHash: candidate near-dup pairs with the signature-based
    * Jaccard estimate (fraction of agreeing slots).
    */
  def minhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = signatureTable(spark, sfDir)
    val pairs = candidatePairs(sigs)
    pairs
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / NumHashes).as("est_jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Per-source corpus signatures via the mergeable [[graft.functions.MinHashMerge]]
    * aggregate (elementwise-min union), then pairwise cross-source
    * similarity estimates — the corpus-level dedup/contamination view.
    * Deterministic; rows-only oracle (signature math is engine-side),
    * union law verified in ScalaTest.
    */
  def sourceSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val docSigs = signatureTable(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select("doc_id", "source"), Seq("doc_id"))
      .select(col("source"), col("sig"))
    val merged = docSigs.groupBy("source")
      .agg(graft.functions.MinHashMerge.minhash_merge(col("sig")).as("msig"))
    val a = merged.select(col("source").as("src_a"), col("msig").as("sig_a"))
    val b = merged.select(col("source").as("src_b"), col("msig").as("sig_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), v => v))
          .cast("double") / NumHashes).as("est_jaccard"))
      .orderBy("src_a", "src_b")
  }

  /** End-to-end corpus dedup pipeline: exact dups out first (keep min
    * doc_id per text), then near-dups out (for every MinHash candidate
    * pair, the higher doc_id is dropped). Survivor counts per source.
    */
  def dedupPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val exactKept = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
    val kept = docs.join(exactKept, Seq("doc_id"), "left_semi")
    val dropNear = minhashPairs(spark, sfDir)
      .select(col("id_b").as("doc_id")).distinct()
    val survivors = kept.join(dropNear, Seq("doc_id"), "left_anti")
    survivors.groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(length(col("text"))).cast("long").as("kept_chars"))
      .orderBy("source")
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: per token take xxhash64 bits,
    * sum ±1 per bit position, sign → fingerprint bit. Native codegen'd
    * kernel ([[graft.functions.SimHash64]]) — the higher-order-function
    * formulation allocated a 64-wide array per token per row.
    */
  def simhash(c: Column): Column =
    graft.functions.SimHash64.simhash64(TextAnalysis.tokens(c))

  /** X-DEDUP SimHash: near-dup pairs = same 16-bit band + Hamming ≤ 8. */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val fps = Tables.documents(spark, sfDir)
      .select(col("doc_id"), simhash(col("text")).as("fp"))
    val bands = fps.select(
      col("doc_id"), col("fp"),
      explode(transform(sequence(lit(0), lit(3)), j =>
        struct(j.as("band"), call_function("shiftright", col("fp"), j * 16).bitwiseAND(0xffffL).as("bkey"))))
        .as("b"))
      .select(col("doc_id"), col("fp"), col("b.band"), col("b.bkey"))
    val l = bands.as("l")
    val r = bands.as("r")
    l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(
        col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
        bit_count(col("l.fp").bitwiseXOR(col("r.fp"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("id_a", "id_b")
  }

  // ---- exact n-gram Jaccard ------------------------------------------

  /** Distinct character 3-grams (oracle-reproducible in DuckDB list SQL). */
  def trigrams(c: Column): Column =
    array_distinct(transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3))))

  /** X-DEDUP n-gram Jaccard on a bounded candidate set (consecutive
    * doc_ids): exact intersection/union — int division done identically
    * in the oracle, so values hash-match.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), trigrams(col("text")).as("grams"))
    val a = docs.select(col("doc_id").as("id_a"), col("grams").as("g_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("grams").as("g_b"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(
        col("id_a"), col("id_b"),
        size(array_intersect(col("g_a"), col("g_b"))).cast("long").as("n_common"),
        size(array_union(col("g_a"), col("g_b"))).cast("long").as("n_union"))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union").cast("double"))
      .orderBy("id_a")
  }
}
