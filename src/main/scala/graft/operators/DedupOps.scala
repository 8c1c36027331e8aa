package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators (BASELINE.json extension surface), designed for
 * 100 TB scale: everything is shuffle-by-key or LSH-bucketed — no all-pairs
 * comparison ever materializes. The only O(n^2) work happens INSIDE a bucket
 * (LSH band, frequency-pruned gram, blocking key), which is the standard
 * scale-out shape for near-dup detection (MinHash/LSH as in Broder '97;
 * banding analysis as in Mining of Massive Datasets ch.3).
 *
 * Hash choice: md5 over strings — deterministic, engine-portable (DuckDB
 * computes the identical hex), so every query here is oracle-checkable.
 * xxhash64 (Spark-native, faster) backs the SimHash variant, which therefore
 * gets a rows-only check.
 *
 * Intermediate shingle/gram tables are cached for the duration of the query
 * (each is read 2-3 times within one plan); long-lived sessions running many
 * dedup passes should `spark.catalog.clearCache()` between corpora — the
 * bench harness does.
 */
object DedupOps {
  import Tables.t

  /** Exact dedup via content-hash groupBy: one group per distinct normalized
   * text, keeping the smallest doc_id (deterministic survivor pick — Spark's
   * dropDuplicates keeps an arbitrary row, which is not reproducible). */
  def exact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(lower(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id")

  /** Distinct 3-word shingles per document as an array column (the MinHash
   * input set). Kept as an array so signatures are computed map-side without
   * an explode+groupBy shuffle; only the Jaccard verify step explodes. */
  private def shingleArrays(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("arr", expr("split(text, ' ')"))
      .filter(expr("size(arr) >= 3"))
      .select(
        col("doc_id"),
        array_distinct(expr(
          "transform(sequence(1, size(arr) - 2), i -> concat_ws(' ', element_at(arr, i), element_at(arr, i+1), element_at(arr, i+2)))"
        )).as("sharr")
      )

  /**
   * MinHash + LSH near-duplicate pairs.
   *
   * 8 min-hashes (h_i = min over shingles of md5("i|" + shingle); min over a
   * keyed hash of a set is a valid MinHash permutation), banded 4x2: docs
   * sharing any band key become candidates, candidates are verified against
   * true shingle Jaccard >= 0.5. For j ~ 0.9 the detection probability is
   * 1-(1-j^2)^4 > 0.999; random pairs essentially never collide on a band.
   *
   * Scale shape: groupBy doc (signature), explode 4 band keys, self-join on
   * band key (shuffle on band — tiny), verify join only on candidates.
   */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingleArrays(spark, dir).cache()
    val sh = docs.select(col("doc_id"), explode(col("sharr")).as("s"))
    // signature entirely map-side: min over a per-row array, no shuffle.
    // The 8 hash functions are the 8-hex-char slices of TWO md5 digests
    // (md5(s) || md5('x'|s)), materialized ONCE per shingle in `digs` —
    // 2 digest computations instead of 8; lexicographic min over fixed-width
    // hex equals numeric min, so each slice is a valid MinHash permutation.
    val withDigs = docs.withColumn(
      "digs", expr("transform(sharr, s -> concat(md5(s), md5(concat('x', s))))"))
    val sigCols = (0 until 8).map { i =>
      expr(s"array_min(transform(digs, d -> substring(d, ${1 + 8 * i}, 8)))").as(s"h$i")
    }
    val sig = withDigs.select((col("doc_id") +: sigCols): _*)
    val bands = sig.select(
      col("doc_id"),
      explode(array(
        concat(lit("0"), col("h0"), col("h1")),
        concat(lit("1"), col("h2"), col("h3")),
        concat(lit("2"), col("h4"), col("h5")),
        concat(lit("3"), col("h6"), col("h7"))
      )).as("bk")
    )
    val cand = bands.as("x").join(bands.as("y"), col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sizes = docs.select(col("doc_id"), size(col("sharr")).cast("long").as("n"))
    val common = broadcast(cand)
      .join(sh.as("sa"), col("sa.doc_id") === col("a"))
      .join(sh.as("sb"), col("sb.doc_id") === col("b") && col("sb.s") === col("sa.s"))
      .groupBy("a", "b").agg(count(lit(1)).as("cm"))
    common
      .join(sizes.as("na"), col("na.doc_id") === col("a"))
      .join(sizes.as("nb"), col("nb.doc_id") === col("b"))
      .withColumn("j", col("cm").cast("double") / (col("na.n") + col("nb.n") - col("cm")))
      .filter(col("j") >= 0.5)
      .select(col("a"), col("b"), round(col("j"), 4).as("jaccard"))
      .orderBy("a", "b")
  }

  /**
   * Character-4-gram Jaccard near-dup with two scale guards:
   * (1) blocking — only pairs with |n_chars delta| <= 10 are compared, via a
   * range-band condition on the gram equi-join (near-identical docs have
   * near-identical lengths); (2) frequency pruning — grams present in > 200
   * documents carry no discriminative signal and are dropped from both sets
   * BEFORE the join (same deterministic rule in the oracle), which caps the
   * join fan-out per gram.
   */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val grams = t(spark, dir, "documents")
      .filter(length(col("text")) >= 4)
      .select(
        col("doc_id"),
        col("n_chars"),
        explode(array_distinct(expr(
          "transform(sequence(1, length(text) - 3), i -> substring(text, i, 4))"
        ))).as("g")
      )
      .cache() // read twice: document-frequency pass + pruned join input
    val rare = grams.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") <= 200)
    val pruned = grams.join(broadcast(rare).select("g"), Seq("g")).cache()
    val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = pruned.as("x")
      .join(
        pruned.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          abs(col("x.n_chars") - col("y.n_chars")) <= 10
      )
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("cm"))
    common
      .join(sizes.as("na"), col("na.doc_id") === col("a"))
      .join(sizes.as("nb"), col("nb.doc_id") === col("b"))
      .withColumn("j", col("cm").cast("double") / (col("na.n") + col("nb.n") - col("cm")))
      .filter(col("j") >= 0.6)
      .select(col("a"), col("b"), round(col("j"), 4).as("jaccard"))
      .orderBy("a", "b")
  }

  /**
   * Winnowing-fingerprint near-dup (rows-only: the rolling hash has no
   * DuckDB analogue): explode each document's winnowed fingerprint set
   * ([[graft.functions.RollingFingerprint]]), bucket-join on fingerprint with
   * a hot-bucket cap, and keep pairs sharing at least `minShared`
   * fingerprints — detects LOCAL overlap (shared runs >= 23 bytes), the case
   * token-set Jaccard and SimHash both miss.
   */
  def winnowDedup(spark: SparkSession, dir: String, minShared: Int = 10): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val fps = t(spark, dir, "documents")
      .select(col("doc_id"), explode(expr("winnow(text)")).as("fp"))
      .cache()
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df")).filter(col("df") <= 50)
    val pruned = fps.join(broadcast(rare.select("fp")), Seq("fp"))
    pruned.as("x").join(pruned.as("y"), col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .orderBy("a", "b")
  }

  /**
   * SimHash near-dup (rows-only check: xxhash64 has no DuckDB analogue).
   * 64-bit SimHash per doc from token xxhash64s; Hamming-LSH via 4x16-bit
   * chunks (two fingerprints within Hamming distance 6 share at least one
   * exact 16-bit chunk only probabilistically — with <= 3 differing bits
   * spread over 4 chunks one chunk is always clean by pigeonhole; 6 bits is
   * best-effort recall, standard for chunked SimHash lookup).
   */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val fp = t(spark, dir, "documents")
      // one xxhash64 per token + 64-counter update, in generated code
      .withColumn("simhash", expr("simhash64(split(text, ' '))"))
      .select(col("doc_id"), col("simhash"))
    val chunks = fp.select(
      col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), c -> struct(c as c, shiftright(simhash, c * 16) & 65535 as v))"
      )).as("ck")
    ).select(col("doc_id"), col("simhash"), col("ck.c").as("c"), col("ck.v").as("v"))
      .cache() // fingerprinting is 64 passes over each token list; never recompute
    // Hot-bucket guard: a chunk value shared by k docs yields k^2/2 candidate
    // pairs; same-domain corpora cluster heavily on 16-bit chunks. Skipping
    // buckets larger than 50 bounds the pair fan-out (standard LSH practice —
    // an overfull bucket carries no discriminative signal anyway).
    val bucketSizes = chunks.groupBy("c", "v").agg(count(lit(1)).as("bsz")).filter(col("bsz") <= 50)
    val pruned = chunks.join(broadcast(bucketSizes.select("c", "v")), Seq("c", "v"))
    pruned.as("x").join(
      pruned.as("y"),
      col("x.c") === col("y.c") && col("x.v") === col("y.v") && col("x.doc_id") < col("y.doc_id")
    )
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy("a", "b")
  }
}
