package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every entry in [[queries]] is an operator from the SURVEY §2 inventory (or a
 * BASELINE.json extension op) expressed Spark-first; entries with a DuckDB
 * oracle in [[oracleSql]] are hash-checked by the driver at sf0.01, the rest
 * get a rows-only check. Column names and types are aligned 1:1 with the
 * oracle SQL (the driver sorts columns by name before hashing).
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.tpchQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- SURVEY §2.2 to_frame pipeline analogues + §2.4 workload ops --
    "q03_filter_project" -> (RelationalOps.filterProject(_, _)),
    "q04_datetime_convert" -> (RelationalOps.datetimeConvert(_, _)),
    "q05_sort_topk" -> (RelationalOps.sortTopK(_, _)),
    "q06_union_tag" -> (RelationalOps.unionTag(_, _)),
    // -- SURVEY §2.5 gap map: aggregations / joins / windows / set ops / scalars --
    "q01_tpch1_agg" -> (RelationalOps.tpchQ1(_, _)),
    "q02_tpch6_filter_agg" -> (RelationalOps.tpchQ6(_, _)),
    "q07_downsample8" -> (RelationalOps.downsample8(_, _)),
    "q08_join_broadcast" -> (RelationalOps.joinBroadcast(_, _)),
    "q09_join_shuffle" -> (RelationalOps.joinShuffle(_, _)),
    "q10_join_anti" -> (RelationalOps.joinAnti(_, _)),
    "q11_join_semi" -> (RelationalOps.joinSemi(_, _)),
    "q12_tpch3_topk" -> (RelationalOps.tpchQ3(_, _)),
    "q13_window_rank" -> (RelationalOps.windowRank(_, _)),
    "q14_window_running" -> (RelationalOps.windowRunning(_, _)),
    "q15_set_except" -> (RelationalOps.setExcept(_, _)),
    "q16_set_intersect" -> (RelationalOps.setIntersect(_, _)),
    "q17_scalar_funcs" -> (RelationalOps.scalarFuncs(_, _)),
    "q18_date_parts" -> (RelationalOps.dateParts(_, _)),
    "q34_rollup" -> (RelationalOps.rollupRegion(_, _)),
    "q35_exists_lateship" -> (RelationalOps.existsLateShip(_, _)),
    "q47_cube" -> (RelationalOps.cubeOrders(_, _)),
    "q48_ntile_decile" -> (RelationalOps.decileHistogram(_, _)),
    "q49_lag_deltas" -> (RelationalOps.lagDeltas(_, _)),
    "q36_correlated_subquery" -> (RelationalOps.correlatedSubquery(_, _)),
    "q37_percentiles" -> (RelationalOps.percentiles(_, _)),
    "q38_window_range_frame" -> (RelationalOps.windowRangeFrame(_, _)),
    "q39_approx_aggs" -> (RelationalOps.approxAggs(_, _)),
    "q40_json_extract" -> (RelationalOps.jsonExtract(_, _)),
    "q41_stats_aggs" -> (RelationalOps.statsAggs(_, _)),
    "q42_array_funcs" -> (RelationalOps.arrayFuncs(_, _)),
    "q46_pivot_conditional" -> (RelationalOps.pivotSegments(_, _)),
    "q64_unpivot" -> (RelationalOps.unpivotMeasures(_, _)),
    "q65_daily_active" -> (RelationalOps.dailyActiveUsers(_, _)),
    "q66_value_histogram" -> (RelationalOps.valueHistogram(_, _)),
    "q67_string_agg" -> (RelationalOps.stringAgg(_, _)),
    // -- extension ops: text analysis (BASELINE.json north star) --
    "q20_text_tokens" -> (TextOps.tokenCount(_, _)),
    "q21_text_quality" -> (TextOps.qualityScore(_, _)),
    "q22_text_fingerprint" -> (TextOps.fingerprint(_, _)),
    "q23_text_langid" -> (TextOps.langId(_, _)),
    "q52_text_repetition" -> (TextOps.repetition(_, _)),
    "q53_tfidf_topterms" -> (TextOps.tfidfTopTerms(_, _)),
    "q68_source_report" -> (TextOps.sourceReport(_, _)),
    "q72_vocab_coverage" -> (TextOps.vocabCoverage(_, _)),
    "q74_pii_redact" -> (TextOps.piiRedact(_, _)),
    "q83_unigram_surprisal" -> (TextOps.unigramSurprisal(_, _)),
    // -- extension ops: dataset assembly (split / shuffle-pack / sample) --
    "q54_hash_split" -> (SamplingOps.hashSplit(_, _)),
    "q55_sequence_pack" -> (SamplingOps.sequencePack(_, _)),
    "q56_stratified_sample" -> (SamplingOps.stratifiedSample(_, _)),
    "q61_decontaminate" -> (SamplingOps.decontaminate(_, _)),
    "q70_decontaminate_bloom" -> (SamplingOps.decontaminateBloom(_, _)),
    "q71_mixture_sample" -> (SamplingOps.mixtureSample(_, _)),
    "q73_length_clip" -> (SamplingOps.lengthClip(_, _)),
    "q76_chunk_split" -> (SamplingOps.chunkSplit(_, _)),
    "q77_incremental_dedup" -> (SamplingOps.incrementalDedup(_, _)),
    // -- extension ops: deduplication --
    "q24_dedup_exact" -> (DedupOps.exact(_, _)),
    "q25_dedup_minhash_lsh" -> (DedupOps.minhashLsh(_, _)),
    "q26_dedup_ngram_jaccard" -> (DedupOps.ngramJaccard(_, _)),
    "q29_dedup_simhash" -> (DedupOps.simhash(_, _)),
    "q44_dedup_winnow" -> (DedupOps.winnowDedup(_, _)),
    "q51_dedup_levenshtein" -> (DedupOps.levenshteinDedup(_, _)),
    "q60_dedup_clusters" -> (DedupOps.dedupClusters(_, _)),
    // -- extension ops: similarity search --
    "q27_knn_bruteforce" -> (VectorOps.knnBruteForce(_, _)),
    // r9: bound to the cluster-blocked variant — label-only blocking is a
    // FIXED-cardinality key (blocks grow linearly with the corpus, pairing
    // quadratically; the r8 sweep measured the identical shape DNF at 100x
    // inside q62). embeddingDedup stays as a documented small-block-only
    // primitive; the shipped bench entry runs the shape that survives 100x.
    "q28_dedup_embedding" -> ((s, d) =>
      VectorOps.embeddingDedupBlocked(s, d).orderBy("a", "b")),
    // oracle-checked although approximate-by-construction: the probe lists
    // are deterministic, so DuckDB reproduces centroids/assignment/probes
    // and the exact re-rank within them (recall still pinned by spec)
    "q75_ann_ivf_topk" -> (VectorOps.ivfTopK(_, _)),
    // -- time-series: resample/gap-fill + as-of join --
    "q19_resample_gapfill" -> (TimeSeriesOps.resampleGapFill(_, _)),
    "q31_asof_join" -> (TimeSeriesOps.asofErrorPurchase(_, _)),
    "q45_interpolate" -> (TimeSeriesOps.interpolateHourly(_, _)),
    "q50_sessionize" -> (TimeSeriesOps.sessionizeBatch(_, _)),
    "q57_range_bucket_join" -> (TimeSeriesOps.rangeBucketJoin(_, _)),
    "q63_ewma" -> (TimeSeriesOps.ewma(_, _)),
    "q78_sliding_window" -> (TimeSeriesOps.slidingWindowAgg(_, _)),
    "q79_funnel" -> (TimeSeriesOps.funnel(_, _)),
    "q80_retention_cohorts" -> (TimeSeriesOps.retentionCohorts(_, _)),
    "q81_salted_join" -> (SkewOps.saltedSegmentRollup(_, _)),
    // SQL entry point: the statement is shared verbatim with the oracle
    "q82_tpch5_sql" -> (RelationalOps.tpchQ5Sql(_, _)),
    "q58_label_centroids" -> (VectorOps.labelCentroids(_, _)),
    // -- multimodal plumbing --
    "q30_mm_features" -> (MultimodalOps.features(_, _)),
    "q32_mm_byte_histogram" -> (MultimodalOps.byteHistograms(_, _)),
    "q59_mm_frame_sample" -> (MultimodalOps.frameSample(_, _)),
    // real javax.imageio decode of synthesized PNGs; oracle recomputes the
    // closed-form geometry/content from doc_id without decoding
    "q84_mm_png_decode" -> (MultimodalOps.pngDecode(_, _)),
    // real javax.sound WAV parse of synthesized PCM16 audio; oracle
    // recomputes format fields + sample sum from doc_id in SQL
    "q85_audio_decode" -> (MultimodalOps.wavDecode(_, _)),
    // real video frame sampling: container parse + seek + ImageIO decode of
    // every 5th frame; oracle recomputes geometry/content from (id, frame)
    "q86_video_frame_decode" -> (MultimodalOps.videoFrameDecode(_, _)),
    // int8 scalar quantization of the embedding corpus (IVF-SQ8 storage
    // path); exact affine-map oracle
    "q87_sq_quantize" -> (VectorOps.scalarQuantize(_, _)),
    // SemDeDup: near-dup removal blocked by learned IVF cluster (the
    // deterministic centroids make assignment + drops oracle-checkable)
    "q88_semantic_dedup" -> (VectorOps.semanticDedup(_, _)),
    // order-1 LM scoring: per-doc mean bigram rarity in exact integers
    "q89_bigram_surprisal" -> (TextOps.bigramSurprisal(_, _)),
    // per-doc benchmark-overlap fraction (ppm) for threshold-based decon
    "q90_contamination_overlap" -> (SamplingOps.contaminationOverlap(_, _)),
    // fasttext-style linear quality model served as one codegen stage
    "q91_quality_classifier" -> (TextOps.qualityClassifier(_, _)),
    // product quantization: 8x4-bit codes from the literal-folded codebook
    "q92_pq_quantize" -> (VectorOps.pqQuantize(_, _)),
    // ExactSubstr-style char-20-gram duplication profile per doc
    "q93_substring_dup" -> (DedupOps.substringDup(_, _)),
    // batched exact KNN: per-query top-5 via the TopKAgg partial-reduce
    "q94_knn_batch" -> (VectorOps.batchKnn(_, _)),
    // PQ asymmetric-distance search over literal-folded codebook + LUT
    "q95_pq_adc_search" -> (VectorOps.pqAdcSearch(_, _)),
    // md5-substrate SimHash: q29's oracle-checkable twin (q61/q70 pairing)
    "q96_simhash_portable" -> (DedupOps.simhashPortable(_, _)),
    // md5-substrate winnowing: q44's oracle-checkable twin
    "q97_winnow_portable" -> (DedupOps.winnowPortable(_, _)),
    // assembly composite: quality gate -> exact dedup -> split -> pack
    "q98_pretrain_export" -> (SamplingOps.pretrainExport(_, _)),
    // IVF+PQ composed: probe 4 inverted lists, ADC-score only within them
    "q99_ivfpq_search" -> (VectorOps.ivfPqSearch(_, _)),
    // PQ shortlist + exact refine: ADC top-100, true-cosine top-20 within
    "q100_pq_refine" -> (VectorOps.pqRefineSearch(_, _)),
    // -- streaming tier through the REAL micro-batch engine (StreamReplay):
    // readStream -> watermark/state -> memory sink, then oracle-compared —
    // the streaming semantics get CORRECTNESS rows, not just ScalaTest
    "q101_stream_windowed_counts" -> (graft.streaming.StreamReplay.windowedCountsReplay(_, _)),
    "q102_stream_sessionize" -> (graft.streaming.StreamReplay.sessionizeReplay(_, _)),
    "q103_stream_dedup" -> (graft.streaming.StreamReplay.dedupReplay(_, _)),
    "q104_stream_interval_join" -> (graft.streaming.StreamReplay.intervalJoinReplay(_, _)),
    "q106_stream_left_outer" -> (graft.streaming.StreamReplay.intervalJoinLeftOuterReplay(_, _)),
    "q107_stream_full_outer" -> (graft.streaming.StreamReplay.intervalJoinFullOuterReplay(_, _)),
    "q108_stream_static_join" -> (graft.streaming.StreamReplay.enrichStaticReplay(_, _)),
    // ANN recall@10: IVF 4-probe hit rate vs exact ground truth, in-plan
    "q105_ann_recall" -> (VectorOps.annRecall(_, _)),
    // Gopher repetition filters: dup/top n-gram fractions, n = 2,3,4
    "q109_ngram_repetition" -> (TextOps.ngramRepetition(_, _)),
    "q110_bm25_topk" -> ((s, d) => TextOps.bm25TopK(s, d)),
    "q111_rrf_fusion" -> ((s, d) => TextOps.rrfFusion(s, d)),
    "q112_weighted_sample" -> ((s, d) => SamplingOps.weightedSample(s, d)),
    "q113_dense_ids" -> (SamplingOps.denseIds(_, _)),
    "q114_cluster_balanced_sample" -> ((s, d) => SamplingOps.clusterBalancedSample(s, d)),
    // RRF with CORPUS-SIZED pools: global ranks via the q113 prefix-offset
    // pattern, so no single-task window anywhere in the plan
    "q115_rrf_corpus" -> ((s, d) => TextOps.rrfFusionCorpus(s, d)),
    // hybrid lexical+dense retrieval: BM25 ranks fused with exact-cosine
    // ranks by RRF, both corpus-sized via the prefix-offset rank pattern
    "q116_hybrid_retrieval" -> ((s, d) => TextOps.hybridRetrieval(s, d)),
    // the production hybrid shape: IVF-probed dense pool + corpus BM25
    "q117_hybrid_ann" -> ((s, d) => TextOps.hybridRetrievalAnn(s, d)),
    // search diversity: hybrid pool keeps one representative per q60
    // near-dup cluster (third consumer of the shared label table)
    "q118_diverse_rerank" -> ((s, d) => TextOps.diverseRerank(s, d)),
    // contrastive-training mining: per-query top-cosine pool minus the
    // query's own q60 near-dup cluster (fourth consumer of the label table)
    "q119_hard_negatives" -> ((s, d) => VectorOps.hardNegatives(s, d)),
    // dedup decision step: each near-dup cluster keeps its highest-quality
    // member (fifth consumer of the shared label table)
    "q120_canonical_by_quality" -> ((s, d) => DedupOps.canonicalByQuality(s, d)),
    // ANN ops dashboard: per-cell population + integer-exact inertia over
    // the q75 IVF assignment (one argmin pass, one 16-group aggregate)
    "q121_ivf_cell_stats" -> ((s, d) => VectorOps.ivfCellStats(s, d)),
    // rank-aware ANN eval: MRR / first-hit / head precision of the probed
    // search vs exact ground truth (q105's recall, position-sensitive)
    "q122_ann_rank_eval" -> ((s, d) => VectorOps.annRankEval(s, d)),
    // whisper streaming TAIL through the real micro-batch engine over the
    // closed-form .wsp tree — walk-listed (q123) and manifest-listed (q124)
    // runs share ONE oracle, so both listing modes are hash-checked
    "q123_stream_whisper_tail" ->
      ((s, _) => graft.streaming.StreamReplay.whisperTailReplay(s, manifestListed = false)),
    "q124_stream_whisper_tail_mani" ->
      ((s, _) => graft.streaming.StreamReplay.whisperTailReplay(s, manifestListed = true)),
    // image near-dup: REAL PNG decode -> integer aHash -> chunked
    // Hamming-LSH; oracle recomputes the hash from the closed-form pattern
    "q125_image_phash_dedup" -> ((s, d) => MultimodalOps.imagePhashDedup(s, d)),
    // audio near-dup: REAL WAV decode -> integer frame-energy fingerprint
    // -> the same LSH; completes multimodal dedup across all 3 modalities
    "q126_audio_fingerprint_dedup" -> ((s, d) => MultimodalOps.audioFingerprintDedup(s, d)),
    // video near-dup: REAL container parse + seek + per-sampled-frame
    // decode + aHash; videos pair on exact shared frame hashes
    "q127_video_phash_dedup" -> ((s, d) => MultimodalOps.videoPhashDedup(s, d)),
    // cross-modal dedup: union of all four per-modality pair graphs ->
    // one connected-components pass -> best-copy-wins kept corpus
    "q128_crossmodal_dedup" -> ((s, d) => DedupOps.crossModalDedup(s, d)),
    // DCT pHash: one decode computes BOTH hashes; aHash chunks BLOCK
    // (pigeonhole recall for small edits), DCT Hamming VERIFIES (the
    // structure-robust distance — brightness-shift-exact by construction)
    "q129_dct_phash_dedup" -> ((s, d) => MultimodalOps.dctPhashDedup(s, d)),
    // shift-robust audio: landmark PAIRS (peak energies + frame delta)
    // pair docs on relative structure — time-shifted twins surface, which
    // q126's absolute framing cannot do
    "q130_audio_landmark_dedup" -> ((s, d) => MultimodalOps.audioLandmarkDedup(s, d)),
    // CCNet-style paragraph dedup: repeated 16-token chunks dropped except
    // their first occurrence; docs reassembled from surviving chunks
    "q131_paragraph_dedup" -> ((s, d) => DedupOps.paragraphDedup(s, d)),
    // streaming MinHash-LSH near-dup flagging: per-band-bucket owner state
    // (one Long per occupied bucket) flags arriving docs that collide with
    // an earlier doc — q25's candidate stage as an online ingest gate
    "q132_stream_lsh_dedup" -> ((s, d) => graft.streaming.StreamReplay.lshDedupReplay(s, d)),
    // streaming curation: the q43 flagship as an online ingest pipeline —
    // quality gate inside the stream's scan stage, then the q132 owner
    // state flags near-dups among ADMITTED docs; kept = gated minus collided
    "q133_stream_curation" -> ((s, d) => graft.streaming.StreamReplay.streamCurationReplay(s, d)),
    // -- whisper source end-to-end (rows-only: DuckDB cannot read .wsp) --
    "q33_whisper_pipeline" -> (WhisperWorkload.pipeline(_, _)),
    "q69_whisper_ref_scale" -> (WhisperWorkload.refScale(_, _)),
    // -- flagship composite: the full curation pass as one plan --
    "q43_curation_pipeline" -> (CurationPipeline.curate(_, _)),
    "q62_joint_curation" -> (CurationPipeline.jointCuration(_, _))
  )

  /** q123/q124 oracle: built FROM the shared fixture constants
   * ([[graft.operators.WhisperWorkload.StreamTailSpecs]] and the frozen
   * window) so the VALUES list cannot drift from what the Scala side
   * writes to disk. Same regeneration math as the q33/q69 oracles. */
  private def whisperTailOracleSql: String = {
    val values = WhisperWorkload.StreamTailSpecs
      .map { case (m, a, spp, pts, filled, last, rot) =>
        s"('$m', $a, $spp, $pts, $filled, $last, $rot)"
      }
      .mkString(",\n|  ")
    s"""WITH spec(metric, archive, spp, pts, filled, last_ts, rot) AS (VALUES
       |  $values),
       |k AS (SELECT metric, archive, spp, pts, filled, last_ts, rot,
       |  unnest(range(0, filled)) AS k FROM spec),
       |pt AS (SELECT metric, archive, last_ts - (filled - 1 - k) * spp AS ts,
       |  sin(CAST((rot + k) % pts AS DOUBLE) / 10) * 100 AS value FROM k),
       |w AS (SELECT * FROM pt
       |  WHERE ts > ${WhisperWorkload.StreamTailStart} AND ts <= ${WhisperWorkload.StreamTailNow})
       |SELECT metric, CAST(archive AS INT) AS archive, CAST(count(*) AS BIGINT) AS n_points,
       |CAST(min(ts) AS BIGINT) AS ts_min, CAST(max(ts) AS BIGINT) AS ts_max,
       |round(avg(value), 4) AS avg_value
       |FROM w GROUP BY metric, archive ORDER BY metric, archive""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** Shared oracle CTE block replaying [[graft.operators.VectorOps]]'s PQ
   * codebook training in DuckDB: systematic 64-codeword seed, then four
   * unrolled integer-Lloyd rounds per 2-dim subspace (32 of them) over the
   * bounded systematic training sample (`vec_id % sstep = 0`,
   * sstep = n/4096) — exact e6-long arithmetic, truncating `//` division,
   * (d2, j)-ordered argmin — landing on the bit-identical trained codebook.
   * Emits `cb(j, cw)` with cw a 64-list ordered (s, d), the shape the
   * q92/q95/q99/q100 consumers index as `cw[s * 2 + i]`. All names are
   * `pt`-prefixed to avoid CTE collisions with the per-query SQL this block
   * is spliced into. */
  private def pqTrainCtes: String = {
    val init =
      """pte AS (SELECT vec_id,
        |  list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe FROM embeddings),
        |pts AS (SELECT greatest(count(*) // 64, 1) AS stepk, greatest(count(*) // 4096, 1) AS sstep FROM pte),
        |ptcb0 AS (SELECT CAST(vec_id // stepk AS INT) AS j, qe AS cw FROM pte, pts
        |  WHERE vec_id % stepk = 0 AND vec_id // stepk < 64),
        |ptsd AS (SELECT s, d FROM (SELECT unnest(range(0, 32)) AS s) CROSS JOIN (SELECT unnest(range(1, 3)) AS d)),
        |ptc0 AS (SELECT ptsd.s AS s, ptcb0.j AS j, ptsd.d AS d, ptcb0.cw[ptsd.s * 2 + ptsd.d] AS c
        |  FROM ptcb0 CROSS JOIN ptsd),
        |pttx AS (SELECT pte.vec_id AS vec_id, ptsd.s AS s, ptsd.d AS d, pte.qe[ptsd.s * 2 + ptsd.d] AS x
        |  FROM pte CROSS JOIN pts CROSS JOIN ptsd WHERE pte.vec_id % pts.sstep = 0)""".stripMargin
    val rounds = (1 to 4).map { t =>
      s"""ptdt$t AS (SELECT pttx.vec_id AS vec_id, pttx.s AS s, pc.j AS j,
         |  sum((pttx.x - pc.c) * (pttx.x - pc.c)) AS d2
         |  FROM pttx JOIN ptc${t - 1} pc ON pttx.s = pc.s AND pttx.d = pc.d
         |  GROUP BY pttx.vec_id, pttx.s, pc.j),
         |ptat$t AS (SELECT vec_id, s, j FROM (SELECT vec_id, s, j,
         |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, j ASC) AS rn FROM ptdt$t)
         |  WHERE rn = 1),
         |ptmt$t AS (SELECT pa.s AS s, pa.j AS j, tx.d AS d, CAST(sum(tx.x) // count(*) AS BIGINT) AS c
         |  FROM ptat$t pa JOIN pttx tx ON tx.vec_id = pa.vec_id AND tx.s = pa.s
         |  GROUP BY pa.s, pa.j, tx.d),
         |ptc$t AS (SELECT pc.s AS s, pc.j AS j, pc.d AS d, coalesce(pm.c, pc.c) AS c
         |  FROM ptc${t - 1} pc LEFT JOIN ptmt$t pm ON pm.s = pc.s AND pm.j = pc.j AND pm.d = pc.d)""".stripMargin
    }.mkString(",\n")
    val fin = "cb AS (SELECT j, array_agg(c ORDER BY s, d) AS cw FROM ptc4 GROUP BY j)"
    init + ",\n" + rounds + ",\n" + fin
  }

  /** DuckDB-SQL replay of Spark's XXH64 (`xxhash64`, seed 42) over token
   * bytes — closing VERDICT r5 gap #1 (q29/q44 were rows-only because "the
   * xxhash64-family kernels have no DuckDB replay"; now they do). Built from
   * the published xxHash64 spec as implemented by
   * `org.apache.spark.sql.catalyst.expressions.XXH64`: the 4-lane 32-byte
   * stripe loop for inputs ≥ 32 B, then the 8-byte word loop, the 4-byte
   * tail, the 1-byte tail, and the final avalanche. All mod-2^64 arithmetic
   * rides in DuckDB HUGEINTs; `a·b mod 2^64` splits `a` into 32-bit halves
   * so no intermediate exceeds 2^127 (HUGEINT max), rotations are two
   * disjoint shifted halves summed, and `xor` is DuckDB's native HUGEINT
   * xor. The 4 stripe lanes are INDEPENDENT reductions over stride-4 word
   * sublists, so each is one `list_reduce` with its lane seed prepended —
   * no mutable 4-tuple state needed. Byte extraction is `ord(substr(..))`,
   * exact because the driver-generated documents corpus is pure ASCII at
   * every sf (octet_length(encode(text)) = length(text) on all rows —
   * checked 2026-08-13); a non-ASCII corpus would need blob slicing.
   * Validated token-for-token against `xxhash64()` in Spark 4.1.2 across
   * lengths 0..65 including stripe-path inputs. */
  private object DuckXxh64 {
    val M = "18446744073709551616" // 2^64
    val P1 = "11400714785074694791"
    val P2 = "14029467366897019727"
    val P3 = "1609587929392839161"
    val P4 = "9650029242287828579"
    val P5 = "2870177450012600261"

    /** (a*b) mod 2^64 without exceeding HUGEINT range. */
    def mul(a: String, b: String): String =
      s"((((($a)>>32)*($b))%4294967296)*4294967296+(($a)&4294967295)*($b))%$M"
    def rotl(x: String, r: Int): String =
      s"((($x)<<$r)%$M+(($x)>>${64 - r}))"
    def xor(a: String, b: String): String = s"xor($a,$b)"

    /** One stripe-lane round: acc = rotl31(acc + w·P2)·P1. */
    def stripeStep: String = mul(rotl(s"((a)+${mul("w", P2)})%$M", 31), P1)
    /** Word-loop round: acc = rotl27(acc ⊕ rotl31(w·P2)·P1)·P1 + P4. */
    def wordStep: String =
      s"(${mul(rotl(xor("a", mul(rotl(mul("w", P2), 31), P1)), 27), P1)}+$P4)%$M"
    /** Byte-tail round: acc = rotl11(acc ⊕ b·P5)·P1. */
    def byteStep: String = mul(rotl(xor("a", s"((b)*$P5)%$M"), 11), P1)
    /** Stripe-merge fold of one lane into the running hash. */
    def mergeRound(h: String, v: String): String =
      s"(${mul(xor(h, mul(rotl(mul(v, P2), 31), P1)), P1)}+$P4)%$M"

    /** CTE chain hashing relation `tk(…, tok)` → `xh(…, uh)` with `uh` the
     * unsigned-64 xxhash64(tok, 42) as HUGEINT. Splice as `",$xxhCtes,"`. */
    def xxhCtes: String = {
      def word(base: String) =
        (0 until 8).map(j => s"bs[$base+${j + 1}]*${1L << (8 * j)}").mkString("+")
      val word4 = (0 until 4).map(j => s"bs[8*nw+${j + 1}]*${1L << (8 * j)}").mkString("+")
      def lane(i: Int, seed: String) =
        s"""CASE WHEN ns = 0 THEN NULL ELSE
           |    list_reduce(list_prepend(CAST($seed AS HUGEINT), list_transform(range(0, ns), k -> ws[4*CAST(k AS INT)+$i])), (a,w) -> $stripeStep) END AS v$i""".stripMargin
      s"""xb AS (SELECT *, length(tok) AS len,
         |  list_transform(range(1, length(tok)+1), i -> CAST(ord(substr(tok,CAST(i AS INT),1)) AS HUGEINT)) AS bs
         |  FROM tk),
         |xw AS (SELECT *, len//8 AS nw, len//32 AS ns,
         |  list_transform(range(0, len//8), w -> ${word("8*CAST(w AS INT)")}) AS ws
         |  FROM xb),
         |xv AS (SELECT *, ${lane(1, s"(42+$P1+$P2)%$M")},
         |  ${lane(2, s"(42+$P2)%$M")},
         |  ${lane(3, "42")},
         |  ${lane(4, s"($M+42-$P1)%$M")}
         |  FROM xw),
         |xm AS (SELECT *, CASE WHEN ns = 0 THEN CAST((42+$P5) AS HUGEINT) ELSE
         |    (${rotl("v1", 1)}+${rotl("v2", 7)}+${rotl("v3", 12)}+${rotl("v4", 18)})%$M END AS h0 FROM xv),
         |xm1 AS (SELECT *, CASE WHEN ns = 0 THEN h0 ELSE ${mergeRound("h0", "v1")} END AS h1 FROM xm),
         |xm2 AS (SELECT *, CASE WHEN ns = 0 THEN h1 ELSE ${mergeRound("h1", "v2")} END AS h2 FROM xm1),
         |xm3 AS (SELECT *, CASE WHEN ns = 0 THEN h2 ELSE ${mergeRound("h2", "v3")} END AS h3 FROM xm2),
         |xm4 AS (SELECT *, (CASE WHEN ns = 0 THEN h3 ELSE ${mergeRound("h3", "v4")} END + len)%$M AS h4 FROM xm3),
         |xwl AS (SELECT *, list_reduce(list_prepend(h4, ws[4*ns+1:nw]), (a,w) -> $wordStep) AS h5 FROM xm4),
         |x4 AS (SELECT *, CASE WHEN len%8 >= 4 THEN
         |    (${mul(rotl(xor("h5", mul(word4, P1)), 23), P2)}+$P3)%$M ELSE h5 END AS h6,
         |  CASE WHEN len%8 >= 4 THEN 8*nw+4 ELSE 8*nw END AS bo FROM xwl),
         |xbl AS (SELECT *, list_reduce(list_prepend(h6, bs[bo+1:len]), (a,b) -> $byteStep) AS h7 FROM x4),
         |xf1 AS (SELECT *, ${mul(xor("h7", "(h7)>>33"), P2)} AS h8 FROM xbl),
         |xf2 AS (SELECT *, ${mul(xor("h8", "(h8)>>29"), P3)} AS h9 FROM xf1),
         |xh AS (SELECT *, xor(h9, (h9)>>32) AS uh FROM xf2)""".stripMargin
    }
  }

  /** q44's oracle hash: the `winnow` kernel's Rabin-Karp 8-gram hash needs
   * no rolling state in SQL — position p's hash is the closed-form 8-term
   * polynomial Σ byte(p+j)·B^(7−j) mod 2^64 (B = 1000000007), so each term
   * is ≤ 2^72 and the 8-term HUGEINT sum stays far inside range with one
   * final mod. Constants are B^j mod 2^64, rendered unsigned. */
  private def winnowGramHash: String = {
    val cs = Iterator.iterate(1L)(_ * 1000000007L).take(8).toArray
    (0 until 8).map { j =>
      s"CAST(ord(substr(text, CAST(p+$j AS INT), 1)) AS HUGEINT)*${java.lang.Long.toUnsignedString(cs(7 - j))}"
    }.mkString("+")
  }

  /** Drop-in replacement for [[pqTrainCtes]]'s `cb`: the trained codebook
   * parquet [[graft.Verify]] writes NEXT TO its outDir (path substituted by
   * Verify at oracle_sql.json write time — `__GRAFT_VERIFY_OUT__` is only
   * ever seen by code paths that never run the SQL). Used by q95/q99/q100;
   * q92 keeps the full training replay so the cached values are themselves
   * oracle-checked. */
  private def pqCachedCb: String =
    "cb AS (SELECT j, cw FROM read_parquet('__GRAFT_VERIFY_OUT__/pq_codebook/*.parquet'))"

  /** The text MinHash-LSH candidate-verify chain, ending at the verified
   * pair list `p` — the shared prefix of [[ClusterCte]] and the q128
   * cross-modal edge union. */
  private def TextPairCtes: String =
    """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS arr FROM documents),
      |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
      |  unnest(list_transform(range(1, len(arr)-1), i -> arr[i]||' '||arr[i+1]||' '||arr[i+2])) AS s
      |  FROM toks WHERE len(arr)>=3)),
      |shd AS (SELECT doc_id, md5(s) || md5('x'||s) AS d FROM sh),
      |sig AS (SELECT doc_id,
      |  min(substr(d,1,8)) h0, min(substr(d,9,8)) h1,
      |  min(substr(d,17,8)) h2, min(substr(d,25,8)) h3,
      |  min(substr(d,33,8)) h4, min(substr(d,41,8)) h5,
      |  min(substr(d,49,8)) h6, min(substr(d,57,8)) h7
      |  FROM shd GROUP BY doc_id),
      |bands AS (SELECT doc_id, '0'||h0||h1 AS bk FROM sig UNION ALL SELECT doc_id, '1'||h2||h3 FROM sig
      |  UNION ALL SELECT doc_id, '2'||h4||h5 FROM sig UNION ALL SELECT doc_id, '3'||h6||h7 FROM sig),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
      |  JOIN bands y ON x.bk=y.bk AND x.doc_id<y.doc_id),
      |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      |common AS (SELECT c.a, c.b, count(*) AS cm FROM cand c JOIN sh sa ON sa.doc_id=c.a
      |  JOIN sh sb ON sb.doc_id=c.b AND sb.s=sa.s GROUP BY c.a, c.b),
      |p AS (SELECT a, b FROM common JOIN sizes na ON na.doc_id=a JOIN sizes nb ON nb.doc_id=b
      |  WHERE cm::DOUBLE/(na.n+nb.n-cm) >= 0.5)""".stripMargin

  /** The MinHash-LSH connected-components CTE chain (q60's clustering),
   * shared by q60 and q114 so their cluster definitions stay in lockstep —
   * ends at the transitive-closure `reach` relation. */
  private def ClusterCte: String =
    TextPairCtes +
      """,
      |e AS (SELECT a AS s, b AS t FROM p UNION ALL SELECT b, a FROM p),
      |reach AS (SELECT s, t FROM e UNION SELECT r.s, e2.t FROM reach r JOIN e e2 ON r.t = e2.s AND e2.t <> r.s)""".stripMargin

  /** q125/q126's shared oracle skeleton (and the q128 union's image/audio
   * legs — ONE generator, so the per-query and composed definitions cannot
   * drift): md5-digest fingerprint bits with pinned bits 0/1, twins at
   * `doc_id % 50 == twinMod` flipping 3 positions of the PREVIOUS doc's
   * pattern. Emits CTEs `{p}d..{p}h`; `{p}h` is (doc_id, c0..c3). */
  private def digestHashCtes(p: String, twinMod: Int, salt: String): String = {
    val hxExpr =
      if (salt.isEmpty) "md5(CAST(seed AS VARCHAR))"
      else s"md5('$salt' || CAST(seed AS VARCHAR))"
    s"""${p}d AS (SELECT doc_id,
       |  CASE WHEN doc_id % 50 = $twinMod THEN doc_id - 1 ELSE doc_id END AS seed,
       |  CASE WHEN doc_id % 50 = $twinMod THEN 1 ELSE 0 END AS twin
       |  FROM documents),
       |${p}bb AS (SELECT doc_id, seed, twin, $hxExpr AS hx,
       |  unnest(range(0, 64)) AS b FROM ${p}d),
       |${p}bits AS (SELECT doc_id, b,
       |  ((CASE WHEN b = 0 THEN 0 WHEN b = 1 THEN 1
       |     ELSE ((strpos('0123456789abcdef', hx[CAST(1 + b // 4 AS INT)]) - 1) >> CAST(3 - b % 4 AS INT)) & 1 END)
       |   + (CASE WHEN twin = 1 AND (b = 2 + seed % 8 OR b = 10 + seed % 7 OR b = 17 + seed % 5)
       |      THEN 1 ELSE 0 END)) % 2 AS bit
       |  FROM ${p}bb),
       |${p}h AS (SELECT doc_id,
       |  CAST(sum(CASE WHEN b < 16 THEN bit * (1 << (15 - b)) ELSE 0 END) AS INTEGER) AS c0,
       |  CAST(sum(CASE WHEN b BETWEEN 16 AND 31 THEN bit * (1 << (31 - b)) ELSE 0 END) AS INTEGER) AS c1,
       |  CAST(sum(CASE WHEN b BETWEEN 32 AND 47 THEN bit * (1 << (47 - b)) ELSE 0 END) AS INTEGER) AS c2,
       |  CAST(sum(CASE WHEN b >= 48 THEN bit * (1 << (63 - b)) ELSE 0 END) AS INTEGER) AS c3
       |  FROM ${p}bits GROUP BY doc_id)""".stripMargin
  }

  /** The chunked-banding CTEs over `{p}h`: 4 bucket rows per doc, hot
   * buckets capped at 50 — emits `{p}ck, {p}pr`. */
  private def bandCtes(p: String): String =
    s"""${p}ck AS (SELECT doc_id, c0, c1, c2, c3, 0 AS c, c0 AS vv FROM ${p}h
       |  UNION ALL SELECT doc_id, c0, c1, c2, c3, 1, c1 FROM ${p}h
       |  UNION ALL SELECT doc_id, c0, c1, c2, c3, 2, c2 FROM ${p}h
       |  UNION ALL SELECT doc_id, c0, c1, c2, c3, 3, c3 FROM ${p}h),
       |${p}pr AS (SELECT * FROM (SELECT ${p}ck.*, count(*) OVER (PARTITION BY c, vv) AS bsz FROM ${p}ck) t WHERE bsz <= 50)""".stripMargin

  /** The 64-entry block-summed integer cosine table as a VALUES list —
   * generated from [[graft.operators.MultimodalOps.DctHash.CosBlock]], the
   * same constants the kernel multiplies, so the q129 oracle's DCT and the
   * Spark kernel's cannot drift (the whisperTailOracleSql discipline). */
  private def dctCbValues: String =
    (for (u <- 0 until 8; i <- 0 until 8)
      yield s"($u, $i, ${MultimodalOps.DctHash.CosBlock(u)(i)})").mkString(", ")

  /** The verified pair list over `{p}pr` — emits `{p}p` with the
   * same-fingerprint Hamming distance (threshold applied by the consumer). */
  private def lshPairCte(p: String): String =
    s"""${p}p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       |  CAST(bit_count(xor(x.c0, y.c0)) + bit_count(xor(x.c1, y.c1)) + bit_count(xor(x.c2, y.c2)) + bit_count(xor(x.c3, y.c3)) AS BIGINT) AS hamming
       |  FROM ${p}pr x JOIN ${p}pr y ON x.c = y.c AND x.vv = y.vv AND x.doc_id < y.doc_id)""".stripMargin

  /** q127's per-frame hash chain (and the q128 union's video leg):
   * emits `{p}d..{p}pr` where `{p}pr` is the hot-hash-capped
   * (doc_id, f, c0..c3) frame-fingerprint list. */
  private def videoFrameCtes(p: String): String =
    s"""${p}d AS (SELECT doc_id,
       |  CASE WHEN doc_id % 50 = 3 THEN doc_id - 1 ELSE doc_id END AS vseed,
       |  CASE WHEN doc_id % 50 = 3 THEN 1 ELSE 0 END AS twin
       |  FROM documents),
       |${p}fr AS (SELECT doc_id, vseed, twin, f FROM ${p}d, (SELECT unnest([0, 2, 4]) AS f) s
       |  WHERE f < 4 + vseed % 3),
       |${p}hs AS (SELECT doc_id, f, vseed * 8 + f AS hseed,
       |  CASE WHEN twin = 1 AND f = 0 THEN 1 ELSE 0 END AS flip FROM ${p}fr),
       |${p}bb AS (SELECT doc_id, f, hseed, flip, md5(CAST(hseed AS VARCHAR)) AS hx,
       |  unnest(range(0, 64)) AS b FROM ${p}hs),
       |${p}bits AS (SELECT doc_id, f, b,
       |  ((CASE WHEN b = 0 THEN 0 WHEN b = 1 THEN 1
       |     ELSE ((strpos('0123456789abcdef', hx[CAST(1 + b // 4 AS INT)]) - 1) >> CAST(3 - b % 4 AS INT)) & 1 END)
       |   + (CASE WHEN flip = 1 AND (b = 2 + hseed % 8 OR b = 10 + hseed % 7 OR b = 17 + hseed % 5)
       |      THEN 1 ELSE 0 END)) % 2 AS bit
       |  FROM ${p}bb),
       |${p}h AS (SELECT doc_id, f,
       |  CAST(sum(CASE WHEN b < 16 THEN bit * (1 << (15 - b)) ELSE 0 END) AS INTEGER) AS c0,
       |  CAST(sum(CASE WHEN b BETWEEN 16 AND 31 THEN bit * (1 << (31 - b)) ELSE 0 END) AS INTEGER) AS c1,
       |  CAST(sum(CASE WHEN b BETWEEN 32 AND 47 THEN bit * (1 << (47 - b)) ELSE 0 END) AS INTEGER) AS c2,
       |  CAST(sum(CASE WHEN b >= 48 THEN bit * (1 << (63 - b)) ELSE 0 END) AS INTEGER) AS c3
       |  FROM ${p}bits GROUP BY doc_id, f),
       |${p}pr AS (SELECT * FROM (SELECT ${p}h.*, count(*) OVER (PARTITION BY c0, c1, c2, c3) AS bsz FROM ${p}h) t
       |  WHERE bsz <= 50)""".stripMargin

  /** Shared oracle CTE block: the corpus-sized BM25 ranking (q110's exact
   * scaled-integer scoring + a global rank window) consumed by the r14
   * retrieval composites (q117, q118). No leading WITH — splice after it.
   * Same text family as the inline q110/q111/q115/q116 blocks. */
  private def Bm25RankCtes: String =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |mm AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY doc_id, tok),
      |dl AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS dl FROM mm GROUP BY doc_id),
      |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t_tot, CAST(count(*) AS BIGINT) AS n_docs FROM dl),
      |q AS (SELECT * FROM (VALUES ('join'), ('vector'), ('window'), ('slow'), ('spark')) AS v(tok)),
      |dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM mm JOIN q USING (tok) GROUP BY tok),
      |sc AS (SELECT mm.doc_id,
      |  CAST((44000000 * least(m, 100000) * 1000000 //
      |        (20000000 * least(m, 100000) + 6000000 + 18 * (dl * 1000000 // (t_tot // n_docs))))
      |     * least((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1), 1000000000000) // 1000000
      |    AS BIGINT) AS contrib
      |  FROM mm JOIN q USING (tok) JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot),
      |bm AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_ppm FROM sc GROUP BY doc_id),
      |ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank_bm25 FROM bm)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q03_filter_project" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 50 ORDER BY event_id""".stripMargin,
    "q04_datetime_convert" ->
      """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket
        |FROM events ORDER BY event_id""".stripMargin,
    // q33/q69: DuckDB cannot read .wsp, but the fixtures are CLOSED-FORM
    // (WhisperWriter ArchiveSpec constants), so the oracle regenerates the
    // expected point set from the spec — slot k of an archive has
    // ts = last - (filled-1-k)*spp and value = sin(((rot+k) % pts)/10)*100
    // — and aggregates it exactly like the Spark query does. What the
    // compare checks is the whole whisper decode pipeline (header parse,
    // ring rotation, BE point decode, timestamp reconstruction).
    "q33_whisper_pipeline" ->
      """WITH pt AS (SELECT 1599999960 - (23000 - 1 - k) * 60 AS ts,
        |  sin(CAST((100 + k) % 43200 AS DOUBLE) / 10) * 100 AS value
        |  FROM generate_series(0, 22999) t(k)),
        |b AS (SELECT ts - ts % 3600 AS bts, value FROM pt WHERE ts >= 1599000000)
        |SELECT CAST(1 AS INT) AS archive,
        |strftime(make_timestamp(bts * 1000000), '%Y-%m-%d %H:00') AS hour_bucket,
        |round(avg(value), 4) AS avg_value, CAST(count(*) AS BIGINT) AS n_points
        |FROM b GROUP BY bts ORDER BY hour_bucket""".stripMargin,
    "q69_whisper_ref_scale" ->
      """WITH spec(archive, spp, pts, filled, last_ts, rot) AS (
        |  VALUES (0, 10, 1555200, 1555200, 1700000000, 123457),
        |         (1, 60, 5256000, 2331015, 1699999980, 987654),
        |         (2, 3600, 87601, 38855, 1699999200, 7701)),
        |k AS (SELECT archive, spp, pts, filled, last_ts, rot, unnest(range(0, filled)) AS k FROM spec),
        |pt AS (SELECT archive, last_ts - (filled - 1 - k) * spp AS ts,
        |  sin(CAST((rot + k) % pts AS DOUBLE) / 10) * 100 AS value FROM k)
        |SELECT CAST(archive AS INT) AS archive, CAST(count(*) AS BIGINT) AS n_points,
        |CAST(min(ts) AS BIGINT) AS ts_min, CAST(max(ts) AS BIGINT) AS ts_max,
        |round(avg(value), 4) AS avg_value
        |FROM pt GROUP BY archive ORDER BY archive""".stripMargin,
    // q123/q124: the whisper streaming tail's delivered point set is
    // closed-form in the fixture's ArchiveSpecs (WhisperWorkload
    // .StreamTailSpecs) plus the frozen (start, now] window — the oracle
    // regenerates it exactly as q69's does and rolls up identically. The
    // SAME SQL serves both listing modes: the walk-listed and the
    // manifest-listed run must deliver the same points.
    "q123_stream_whisper_tail" -> whisperTailOracleSql,
    "q124_stream_whisper_tail_mani" -> whisperTailOracleSql,
    // q125: the aHash of a block-pattern image IS the pattern
    // (MultimodalOps.PerceptualHash scaladoc proves the integer-exact
    // threshold recovery), so the oracle computes the hash from the
    // pattern formula while Spark derives it from genuinely decoded
    // pixels; the LSH tail is q96's verbatim. Generated CTEs (r17) so the
    // q128 cross-modal union regenerates the SAME edge definition.
    "q125_image_phash_dedup" ->
      ("WITH " + digestHashCtes("", 1, "") + ",\n" + bandCtes("") + ",\n" + lshPairCte("") +
        "\nSELECT a, b, hamming FROM p WHERE hamming <= 6 ORDER BY a, b"),
    // q126: q125's oracle skeleton with the audio bit universe — frame
    // energies recover md5('a' || seed) bits exactly (AudioFingerprint
    // scaladoc), twins at doc_id % 50 = 2
    "q126_audio_fingerprint_dedup" ->
      ("WITH " + digestHashCtes("", 2, "a") + ",\n" + bandCtes("") + ",\n" + lshPairCte("") +
        "\nSELECT a, b, hamming FROM p WHERE hamming <= 6 ORDER BY a, b"),
    // q127: per-frame seed vseed*8+f, sampled frames {0,2,4} cut by the
    // video's frame count (4 + vseed%3); twin flips frame 0's pattern at
    // its 3 flip positions, so that frame drops out of the exact join and
    // the pair surfaces with the remaining shared sampled frames
    "q127_video_phash_dedup" ->
      ("WITH " + videoFrameCtes("") +
        """
        |SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared_frames
        |FROM pr x JOIN pr y ON x.c0 = y.c0 AND x.c1 = y.c1 AND x.c2 = y.c2 AND x.c3 = y.c3
        |  AND x.doc_id < y.doc_id
        |GROUP BY x.doc_id, y.doc_id ORDER BY a, b""".stripMargin),
    // q128: cross-modal dedup — the union of ALL FOUR per-modality edge
    // sets (text MinHash p, image i_p, audio a_p, video v_ exact frame
    // pairs), each regenerated by the same generator its own oracle uses,
    // transitive closure over the union, best-copy-wins election (q120's
    // quality law), kept corpus = winners + untouched docs
    "q128_crossmodal_dedup" ->
      (TextPairCtes + ",\n" +
        digestHashCtes("i_", 1, "") + ",\n" + bandCtes("i_") + ",\n" + lshPairCte("i_") + ",\n" +
        digestHashCtes("a_", 2, "a") + ",\n" + bandCtes("a_") + ",\n" + lshPairCte("a_") + ",\n" +
        videoFrameCtes("v_") + ",\n" +
        """v_p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM v_pr x JOIN v_pr y
        |  ON x.c0 = y.c0 AND x.c1 = y.c1 AND x.c2 = y.c2 AND x.c3 = y.c3 AND x.doc_id < y.doc_id),
        |allp AS (SELECT a, b FROM p
        |  UNION SELECT a, b FROM i_p WHERE hamming <= 6
        |  UNION SELECT a, b FROM a_p WHERE hamming <= 6
        |  UNION SELECT a, b FROM v_p),
        |e AS (SELECT a AS s, b AS t FROM allp UNION ALL SELECT b, a FROM allp),
        |reach AS (SELECT s, t FROM e UNION SELECT r.s, e2.t FROM reach r JOIN e e2 ON r.t = e2.s AND e2.t <> r.s),
        |cl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster FROM reach GROUP BY s),
        |qd AS (SELECT doc_id, text,
        |  CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text) AS punct_r,
        |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_r
        |  FROM documents),
        |qs AS (SELECT doc_id,
        |  CAST(round(least(1.0, length(text)/500.0)*(1.0-punct_r)*(0.5+0.5*stop_r)*1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM qd),
        |m AS (SELECT cl.cluster, qs.doc_id, qs.quality_score_k,
        |  row_number() OVER (PARTITION BY cl.cluster ORDER BY qs.quality_score_k DESC, qs.doc_id ASC) AS rn,
        |  count(*) OVER (PARTITION BY cl.cluster) AS n_members
        |  FROM cl JOIN qs USING (doc_id)),
        |win AS (SELECT doc_id, cluster, CAST(n_members - 1 AS BIGINT) AS n_removed FROM m WHERE rn = 1),
        |lone AS (SELECT d.doc_id, d.doc_id AS cluster, CAST(0 AS BIGINT) AS n_removed FROM documents d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM cl))
        |SELECT doc_id, cluster, n_removed FROM win
        |UNION ALL SELECT doc_id, cluster, n_removed FROM lone
        |ORDER BY doc_id""".stripMargin),
    // q129: DCT pHash — block on the aHash chunks (q125's h/pr CTEs
    // verbatim), verify by the DCT-hash Hamming distance. The oracle
    // recomputes the 2-D DCT over the block-constant pattern via the
    // block-summed integer cosine table (VALUES generated from
    // DctHash.CosBlock — the whisperTailOracleSql constants-sharing
    // discipline): an exact regrouping of Spark's per-pixel integer sums,
    // so the two hashes agree bit-for-bit. Median = 32nd smallest of the
    // 63 non-DC coefficients (positional, engine-portable); DC bit pinned.
    "q129_dct_phash_dedup" ->
      ("WITH " + digestHashCtes("", 1, "") + ",\n" + bandCtes("") + ",\n" +
        s"cb(u, i, cbv) AS (VALUES $dctCbValues),\n" +
        """blk AS (SELECT doc_id, b % 8 AS bx, b // 8 AS by,
        |  CASE WHEN bit = 1 THEN 192 ELSE 64 END AS gray FROM bits),
        |g AS (SELECT blk.doc_id, cb.u, blk.by, sum(blk.gray * cb.cbv) AS gv
        |  FROM blk JOIN cb ON cb.i = blk.bx GROUP BY blk.doc_id, cb.u, blk.by),
        |fc AS (SELECT g.doc_id, g.u, cb.u AS v, sum(g.gv * cb.cbv) AS fv
        |  FROM g JOIN cb ON cb.i = g.by GROUP BY g.doc_id, g.u, cb.u),
        |nd AS (SELECT doc_id, fv, row_number() OVER (PARTITION BY doc_id ORDER BY fv ASC) AS rn
        |  FROM fc WHERE NOT (u = 0 AND v = 0)),
        |med AS (SELECT doc_id, fv AS m FROM nd WHERE rn = 32),
        |dbit AS (SELECT fc.doc_id, fc.u * 8 + fc.v AS b,
        |  CASE WHEN NOT (fc.u = 0 AND fc.v = 0) AND fc.fv > med.m THEN 1 ELSE 0 END AS bit
        |  FROM fc JOIN med ON fc.doc_id = med.doc_id),
        |dh AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN b < 16 THEN bit * (1 << (15 - b)) ELSE 0 END) AS INTEGER) AS d0,
        |  CAST(sum(CASE WHEN b BETWEEN 16 AND 31 THEN bit * (1 << (31 - b)) ELSE 0 END) AS INTEGER) AS d1,
        |  CAST(sum(CASE WHEN b BETWEEN 32 AND 47 THEN bit * (1 << (47 - b)) ELSE 0 END) AS INTEGER) AS d2,
        |  CAST(sum(CASE WHEN b >= 48 THEN bit * (1 << (63 - b)) ELSE 0 END) AS INTEGER) AS d3
        |  FROM dbit GROUP BY doc_id),
        |cp AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM pr x JOIN pr y ON x.c = y.c AND x.vv = y.vv AND x.doc_id < y.doc_id),
        |pd AS (SELECT cp.a, cp.b,
        |  CAST(bit_count(xor(xa.d0, xb.d0)) + bit_count(xor(xa.d1, xb.d1)) + bit_count(xor(xa.d2, xb.d2)) + bit_count(xor(xa.d3, xb.d3)) AS BIGINT) AS hamming
        |  FROM cp JOIN dh xa ON xa.doc_id = cp.a JOIN dh xb ON xb.doc_id = cp.b)
        |SELECT a, b, hamming FROM pd WHERE hamming <= 20 ORDER BY a, b""".stripMargin),
    // q130: landmark-pair audio dedup — the oracle replays the staircase
    // levels from the md5 hex digits (frame energy EXACTLY 6400*(1+level),
    // quantized 100*(1+level) — order-isomorphic to Spark's integer
    // energies, so peak detection agrees), shifts twins by 2 silent
    // frames, and recomputes the same peak/landmark/cap/join pipeline;
    // Spark's landmarks come from genuinely decoded samples
    "q130_audio_landmark_dedup" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 50 = 4 THEN doc_id - 1 ELSE doc_id END AS seed,
        |  CASE WHEN doc_id % 50 = 4 THEN 1 ELSE 0 END AS twin
        |  FROM documents),
        |hx AS (SELECT doc_id, twin,
        |  md5('L0' || CAST(seed AS VARCHAR)) || md5('L1' || CAST(seed AS VARCHAR)) ||
        |  md5('L2' || CAST(seed AS VARCHAR)) || md5('L3' || CAST(seed AS VARCHAR)) AS h
        |  FROM d),
        |lv AS (SELECT doc_id, twin, f,
        |  ((strpos('0123456789abcdef', h[CAST(2*f+1 AS INT)]) - 1) * 16
        |   + (strpos('0123456789abcdef', h[CAST(2*f+2 AS INT)]) - 1)) % 32 AS v
        |  FROM hx, (SELECT unnest(range(0, 64)) AS f) s),
        |frames AS (
        |  SELECT doc_id, f + 2 * twin AS g, 100 * (1 + v) AS q FROM lv
        |  UNION ALL
        |  SELECT doc_id, s.g, 0 AS q FROM d, (SELECT unnest([0, 1]) AS g) s WHERE twin = 1),
        |pk AS (SELECT doc_id, g, q FROM (
        |    SELECT doc_id, g, q,
        |      lag(q) OVER (PARTITION BY doc_id ORDER BY g) AS pq,
        |      lead(q) OVER (PARTITION BY doc_id ORDER BY g) AS nq
        |    FROM frames) t
        |  WHERE pq IS NOT NULL AND nq IS NOT NULL AND q > pq AND q >= nq),
        |k AS (SELECT DISTINCT a.doc_id, a.q AS qa, b.q AS qb, b.g - a.g AS dt
        |  FROM pk a JOIN pk b ON a.doc_id = b.doc_id AND b.g > a.g AND b.g - a.g <= 8),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM k GROUP BY doc_id),
        |kc AS (SELECT * FROM (SELECT k.*, count(*) OVER (PARTITION BY qa, qb, dt) AS bsz FROM k) t WHERE bsz <= 50),
        |p AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM kc x JOIN kc y ON x.qa = y.qa AND x.qb = y.qb AND x.dt = y.dt AND x.doc_id < y.doc_id
        |  GROUP BY x.doc_id, y.doc_id)
        |SELECT p.a, p.b, p.n_shared FROM p
        |JOIN cnt ca ON ca.doc_id = p.a JOIN cnt cb ON cb.doc_id = p.b
        |WHERE p.n_shared >= 4 AND 2 * p.n_shared >= least(ca.c, cb.c)
        |ORDER BY a, b""".stripMargin,
    "q05_sort_topk" ->
      "SELECT event_id, user_id, value FROM events ORDER BY value DESC, event_id LIMIT 100",
    "q06_union_tag" ->
      """SELECT 'high' AS tag, event_id, value FROM events WHERE value >= 100
        |UNION ALL
        |SELECT 'low' AS tag, event_id, value FROM events WHERE value < 100
        |ORDER BY event_id, tag""".stripMargin,
    "q01_tpch1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |CAST(round(sum(l_extendedprice*(1-l_discount))/100.0, 0) AS BIGINT) AS sum_disc_price_h,
        |round(sum(l_discount),2) AS sum_disc,
        |CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_tpch6_filter_agg" ->
      """SELECT CAST(round(sum(l_extendedprice*l_discount)/100.0, 0) AS BIGINT) AS revenue_h FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q07_downsample8" ->
      """SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
        |CAST(count(*) AS BIGINT) AS n,
        |CAST(round(sum(value)*100.0, 0) AS BIGINT) AS agg_sum_cents,
        |CAST(round(sum(coalesce(value,0))*100.0, 0) AS BIGINT) AS agg_sum_zero_cents,
        |arg_max(value, event_id) AS agg_last,
        |max(value) AS agg_max,
        |min(value) AS agg_min,
        |max(abs(value)) AS agg_absmax,
        |min(abs(value)) AS agg_absmin
        |FROM events GROUP BY 1,2 ORDER BY event_type, hour_bucket""".stripMargin,
    "q08_join_broadcast" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
        |round(sum(c_acctbal),2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q09_join_shuffle" ->
      """SELECT o_orderpriority, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |CAST(round(sum(l_extendedprice*(1-l_discount))/100.0, 0) AS BIGINT) AS revenue_h
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q11_join_semi" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q12_tpch3_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |CAST(round(sum(l_extendedprice*(1-l_discount))/100.0, 0) AS BIGINT) AS revenue_h
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, odate ORDER BY revenue_h DESC, o_orderkey LIMIT 10""".stripMargin,
    "q13_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q14_window_running" ->
      """SELECT event_id, user_id,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running
        |FROM events ORDER BY event_id""".stripMargin,
    "q15_set_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        |EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 250
        |ORDER BY user_id""".stripMargin,
    "q16_set_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "q17_scalar_funcs" ->
      """SELECT doc_id, upper(substr(text,1,10)) AS head10,
        |CAST(length(text) AS BIGINT) AS len, n_chars,
        |lang || '_' || source AS tag FROM documents ORDER BY doc_id""".stripMargin,
    "q18_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS oyear,
        |CAST(quarter(o_orderdate) AS INT) AS oquarter,
        |CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY 1,2 ORDER BY oyear, oquarter""".stripMargin,
    "q20_text_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_pieces,
        |round(CAST(length(replace(text,' ','')) AS DOUBLE)/len(string_split(text,' ')), 4) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_text_quality" ->
      """WITH q AS (SELECT doc_id, text, string_split(text,' ') AS toks,
        |  CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text) AS punct_r,
        |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_r
        |  FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, round(punct_r,4) AS punct_ratio,
        |round(stop_r,4) AS stopword_ratio,
        |CAST(round(least(1.0, length(text)/500.0)*(1.0-punct_r)*(0.5+0.5*stop_r)*1000.0, 0) AS BIGINT) AS quality_score_k
        |FROM q ORDER BY doc_id""".stripMargin,
    "q22_text_fingerprint" ->
      """SELECT doc_id, md5(lower(text)) AS fp, substr(md5(lower(text)),1,8) AS fp_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q23_text_langid" ->
      """WITH c AS (SELECT doc_id, lang,
        | len(list_filter(string_split(text,' '), x->list_contains(['the','a','of','and','to','in'],x))) AS c_en,
        | len(list_filter(string_split(text,' '), x->list_contains(['der','die','das','und','nicht'],x))) AS c_de,
        | len(list_filter(string_split(text,' '), x->list_contains(['el','la','de','y','que'],x))) AS c_es,
        | len(list_filter(string_split(text,' '), x->list_contains(['le','la','de','et','les'],x))) AS c_fr,
        | len(list_filter(string_split(text,' '), x->list_contains(['的','是','在'],x))) AS c_zh
        |FROM documents)
        |SELECT doc_id, lang AS lang_label,
        |CASE WHEN c_zh>=c_fr AND c_zh>=c_es AND c_zh>=c_en AND c_zh>=c_de THEN 'zh'
        | WHEN c_fr>=c_es AND c_fr>=c_en AND c_fr>=c_de THEN 'fr'
        | WHEN c_es>=c_en AND c_es>=c_de THEN 'es'
        | WHEN c_en>=c_de THEN 'en' ELSE 'de' END AS lang_pred,
        |CAST(c_en AS BIGINT) AS hits_en FROM c ORDER BY doc_id""".stripMargin,
    "q24_dedup_exact" ->
      """SELECT md5(lower(text)) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q25_dedup_minhash_lsh" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS arr FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, len(arr)-1), i -> arr[i]||' '||arr[i+1]||' '||arr[i+2])) AS s
        |  FROM toks WHERE len(arr)>=3)),
        |shd AS (SELECT doc_id, md5(s) || md5('x'||s) AS d FROM sh),
        |sig AS (SELECT doc_id,
        |  min(substr(d,1,8)) h0, min(substr(d,9,8)) h1,
        |  min(substr(d,17,8)) h2, min(substr(d,25,8)) h3,
        |  min(substr(d,33,8)) h4, min(substr(d,41,8)) h5,
        |  min(substr(d,49,8)) h6, min(substr(d,57,8)) h7
        |  FROM shd GROUP BY doc_id),
        |bands AS (SELECT doc_id, '0'||h0||h1 AS bk FROM sig UNION ALL SELECT doc_id, '1'||h2||h3 FROM sig
        |  UNION ALL SELECT doc_id, '2'||h4||h5 FROM sig UNION ALL SELECT doc_id, '3'||h6||h7 FROM sig),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
        |  JOIN bands y ON x.bk=y.bk AND x.doc_id<y.doc_id),
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
        |common AS (SELECT c.a, c.b, count(*) AS cm FROM cand c JOIN sh sa ON sa.doc_id=c.a
        |  JOIN sh sb ON sb.doc_id=c.b AND sb.s=sa.s GROUP BY c.a, c.b)
        |SELECT a, b, round(cm::DOUBLE/(na.n+nb.n-cm),4) AS jaccard FROM common
        |JOIN sizes na ON na.doc_id=a JOIN sizes nb ON nb.doc_id=b
        |WHERE cm::DOUBLE/(na.n+nb.n-cm) >= 0.5 ORDER BY a, b""".stripMargin,
    // byte-level blob iteration in DuckDB: hex() the payload, read the HIGH
    // NIBBLE of each byte pair — with 16 bins, bin(byte) = byte >>> 4 IS the
    // high nibble, so the hex route reproduces byte_histogram exactly
    "q32_mm_byte_histogram" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
        |  octet_length(encode(text)) AS nb FROM documents),
        |n AS (SELECT doc_id, nb, list_transform(range(nb),
        |  i -> strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1)) - 1) AS nibs FROM h),
        |hist AS (SELECT doc_id, nb,
        |  list_transform(range(16), k -> CAST(len(list_filter(nibs, c -> c = k)) AS BIGINT)) AS hist FROM n)
        |SELECT doc_id AS id, CAST(nb AS BIGINT) AS total_bytes,
        |CAST(list_position(hist, list_max(hist)) AS BIGINT) AS modal_bin,
        |array_to_string(hist, ',') AS hist_csv
        |FROM hist ORDER BY id""".stripMargin,
    "q26_dedup_ngram_jaccard" ->
      """WITH g0 AS (SELECT DISTINCT * FROM (SELECT doc_id, n_chars,
        |  unnest(list_transform(range(1, length(text)-2), i -> substr(text, i, 4))) AS g
        |  FROM documents WHERE length(text) >= 4)),
        |rare AS (SELECT g FROM g0 GROUP BY g
        |  HAVING count(*) <= 200),
        |g1 AS (SELECT g0.* FROM g0 JOIN rare USING (g)),
        |sizes AS (SELECT doc_id, count(*) n FROM g1 GROUP BY 1),
        |common AS (SELECT x.doc_id a, y.doc_id b, count(*) cm FROM g1 x JOIN g1 y
        |  ON x.g=y.g AND x.doc_id<y.doc_id AND abs(x.n_chars-y.n_chars)<=10 GROUP BY 1,2)
        |SELECT a, b, round(cm::DOUBLE/(na.n+nb.n-cm),4) AS jaccard FROM common
        |JOIN sizes na ON na.doc_id=a JOIN sizes nb ON nb.doc_id=b
        |WHERE cm::DOUBLE/(na.n+nb.n-cm) >= 0.6 ORDER BY a, b""".stripMargin,
    "q27_knn_bruteforce" ->
      """SELECT vec_id, round(list_inner_product(embedding::DOUBLE[], q.qe)
        |  /(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))*sqrt(list_inner_product(q.qe,q.qe))),6) AS cos
        |FROM embeddings, (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id=0) q
        |WHERE vec_id<>0 ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    "q75_ann_ivf_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < 16),
        |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
        |probes AS (SELECT cid FROM c, q ORDER BY list_distance(cent, qe) ASC, cid ASC LIMIT 4),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT e.vec_id AS vec_id, c.cid AS cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_distance(e.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM e CROSS JOIN c) t WHERE rn = 1)
        |SELECT e.vec_id AS vec_id, a.bucket AS bucket,
        |  round(list_inner_product(e.emb, q.qe)
        |    / (sqrt(list_inner_product(e.emb, e.emb)) * sqrt(list_inner_product(q.qe, q.qe))), 6) AS cos
        |FROM e JOIN assign a ON e.vec_id = a.vec_id CROSS JOIN q
        |WHERE e.vec_id <> 0 AND a.bucket IN (SELECT cid FROM probes)
        |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin,
    "q28_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest((count(*) + 124) // 125, 1) AS k,
        |  greatest(count(*) // greatest((count(*) + 124) // 125, 1), 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < k),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT e.vec_id AS vec_id, c.cid AS cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_distance(e.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM e CROSS JOIN c) t WHERE rn = 1),
        |ea AS (SELECT e.vec_id, e.label, a.bucket, e.emb FROM e JOIN assign a USING (vec_id))
        |SELECT x.vec_id AS a, y.vec_id AS b,
        |round(list_inner_product(x.emb,y.emb)/(sqrt(list_inner_product(x.emb,x.emb))*sqrt(list_inner_product(y.emb,y.emb))),4) AS cos
        |FROM ea x JOIN ea y ON x.label=y.label AND x.bucket=y.bucket AND x.vec_id<y.vec_id
        |WHERE list_inner_product(x.emb,y.emb)/(sqrt(list_inner_product(x.emb,x.emb))*sqrt(list_inner_product(y.emb,y.emb))) >= 0.35
        |ORDER BY a, b""".stripMargin,
    "q19_resample_gapfill" ->
      """WITH spine AS (SELECT h FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) s(h)),
        |types AS (SELECT DISTINCT event_type FROM events),
        |agg AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n0,
        |  CAST(round(sum(value)*100.0, 0) AS BIGINT) AS sc0
        |  FROM events GROUP BY 1,2)
        |SELECT strftime(s.h, '%Y-%m-%d %H:00') AS hour_bucket, t.event_type,
        |CAST(coalesce(a.n0, 0) AS BIGINT) AS n,
        |CAST(coalesce(a.sc0, -1) AS BIGINT) AS sum_cents
        |FROM spine s CROSS JOIN types t
        |LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type
        |ORDER BY hour_bucket, t.event_type""".stripMargin,
    "q45_interpolate" ->
      """WITH spine AS (SELECT h FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) s(h)),
        |types AS (SELECT DISTINCT event_type FROM events),
        |agg AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n0,
        |  CAST(round(sum(value)*100.0, 0) AS BIGINT) AS sc0 FROM events GROUP BY 1,2),
        |base AS (SELECT s.h, t.event_type, CAST(coalesce(a.n0, 0) AS BIGINT) AS n,
        |  a.sc0 AS sc, CAST(epoch(s.h)/3600 AS BIGINT) AS idx
        |  FROM spine s CROSS JOIN types t
        |  LEFT JOIN agg a ON a.h = s.h AND a.event_type = t.event_type),
        |win AS (SELECT h, event_type, n, sc, idx,
        |  last_value(CASE WHEN n > 0 THEN {'i': idx, 'v': sc} END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        |  first_value(CASE WHEN n > 0 THEN {'i': idx, 'v': sc} END IGNORE NULLS)
        |    OVER (PARTITION BY event_type ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        |  FROM base)
        |SELECT strftime(h, '%Y-%m-%d %H:00') AS hour_bucket, event_type, n,
        |CAST(CASE WHEN n > 0 THEN sc
        |  WHEN p IS NOT NULL AND nx IS NOT NULL THEN
        |    floor(p.v + (nx.v - p.v) * (idx - p.i) / (nx.i - p.i))
        |  ELSE -1 END AS BIGINT) AS filled_cents
        |FROM win ORDER BY hour_bucket, event_type""".stripMargin,
    "q31_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value FROM events),
        |err AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'error'),
        |pur AS (SELECT user_id, us, value FROM e WHERE event_type = 'purchase')
        |SELECT err.event_id, err.user_id, coalesce(p.value, -1.0) AS last_purchase_value
        |FROM err ASOF LEFT JOIN pur p ON err.user_id = p.user_id AND err.us >= p.us
        |ORDER BY event_id""".stripMargin,
    "q34_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |CAST(count(*) AS BIGINT) AS n_cust, round(sum(c_acctbal),2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation""".stripMargin,
    "q40_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |CAST(count(*) AS BIGINT) AS n, round(sum(value),2) AS total
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q39_approx_aggs" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |TRUE AS approx_users_ok, TRUE AS approx_med_ok, TRUE AS approx_p99_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q41_stats_aggs" ->
      """SELECT event_type,
        |CAST(round(stddev_samp(value)*1000.0, 0) AS BIGINT) AS sd_k,
        |CAST(round(var_samp(value)*100.0, 0) AS BIGINT) AS var_c,
        |CAST(round(corr(value, CAST(user_id AS DOUBLE))*10000.0, 0) AS BIGINT) AS corr_e4
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q42_array_funcs" ->
      """SELECT vec_id, list_max(embedding) AS mx, list_min(embedding) AS mn,
        |CAST(len(embedding) AS BIGINT) AS dim, embedding[1] AS first_dim, label
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q46_pivot_conditional" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS oyear,
        |round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN o_totalprice ELSE 0 END),2) AS automobile,
        |round(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN o_totalprice ELSE 0 END),2) AS building,
        |round(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN o_totalprice ELSE 0 END),2) AS furniture,
        |round(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN o_totalprice ELSE 0 END),2) AS household,
        |round(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN o_totalprice ELSE 0 END),2) AS machinery
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY oyear""".stripMargin,
    "q36_correlated_subquery" ->
      """SELECT CAST(round(sum(l_extendedprice) / 7.0 / 100.0, 0) AS BIGINT) AS avg_yearly_h
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = (SELECT min(p_brand) FROM part)
        |AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
    "q37_percentiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5),4) AS med,
        |round(quantile_cont(value, 0.9),4) AS p90
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q38_window_range_frame" ->
      """SELECT event_id, user_id,
        |round(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4) AS trail_1h_avg,
        |CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_1h_n
        |FROM events ORDER BY event_id""".stripMargin,
    "q43_curation_pipeline" ->
      """WITH q AS (SELECT doc_id, string_split(text,' ') AS toks,
        |  CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text) AS punct_r,
        |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_r,
        |  length(text) AS lt FROM documents),
        |quality AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(least(1.0, lt/500.0)*(1.0-punct_r)*(0.5+0.5*stop_r)*1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM q),
        |c AS (SELECT doc_id,
        | len(list_filter(string_split(text,' '), x->list_contains(['the','a','of','and','to','in'],x))) AS c_en,
        | len(list_filter(string_split(text,' '), x->list_contains(['der','die','das','und','nicht'],x))) AS c_de,
        | len(list_filter(string_split(text,' '), x->list_contains(['el','la','de','y','que'],x))) AS c_es,
        | len(list_filter(string_split(text,' '), x->list_contains(['le','la','de','et','les'],x))) AS c_fr,
        | len(list_filter(string_split(text,' '), x->list_contains(['的','是','在'],x))) AS c_zh
        | FROM documents),
        |lang AS (SELECT doc_id,
        | CASE WHEN c_zh>=c_fr AND c_zh>=c_es AND c_zh>=c_en AND c_zh>=c_de THEN 'zh'
        |  WHEN c_fr>=c_es AND c_fr>=c_en AND c_fr>=c_de THEN 'fr'
        |  WHEN c_es>=c_en AND c_es>=c_de THEN 'es'
        |  WHEN c_en>=c_de THEN 'en' ELSE 'de' END AS lang_pred FROM c),
        |toksv AS (SELECT doc_id, string_split(text,' ') AS arr FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, len(arr)-1), i -> arr[i]||' '||arr[i+1]||' '||arr[i+2])) AS s
        |  FROM toksv WHERE len(arr)>=3)),
        |shd AS (SELECT doc_id, md5(s) || md5('x'||s) AS d FROM sh),
        |sig AS (SELECT doc_id,
        |  min(substr(d,1,8)) h0, min(substr(d,9,8)) h1,
        |  min(substr(d,17,8)) h2, min(substr(d,25,8)) h3,
        |  min(substr(d,33,8)) h4, min(substr(d,41,8)) h5,
        |  min(substr(d,49,8)) h6, min(substr(d,57,8)) h7
        |  FROM shd GROUP BY doc_id),
        |bands AS (SELECT doc_id, '0'||h0||h1 AS bk FROM sig UNION ALL SELECT doc_id, '1'||h2||h3 FROM sig
        |  UNION ALL SELECT doc_id, '2'||h4||h5 FROM sig UNION ALL SELECT doc_id, '3'||h6||h7 FROM sig),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
        |  JOIN bands y ON x.bk=y.bk AND x.doc_id<y.doc_id),
        |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
        |common AS (SELECT c2.a, c2.b, count(*) AS cm FROM cand c2 JOIN sh sa ON sa.doc_id=c2.a
        |  JOIN sh sb ON sb.doc_id=c2.b AND sb.s=sa.s GROUP BY c2.a, c2.b),
        |losers AS (SELECT DISTINCT b AS doc_id FROM common
        |  JOIN sizes na ON na.doc_id=a JOIN sizes nb ON nb.doc_id=b
        |  WHERE cm::DOUBLE/(na.n+nb.n-cm) >= 0.5)
        |SELECT quality.doc_id, lang.lang_pred, quality.n_tokens, quality.quality_score_k
        |FROM quality JOIN lang ON lang.doc_id = quality.doc_id
        |WHERE quality.quality_score_k >= 300 AND quality.n_tokens >= 20
        |AND NOT EXISTS (SELECT 1 FROM losers WHERE losers.doc_id = quality.doc_id)
        |ORDER BY quality.doc_id""".stripMargin,
    "q30_mm_features" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len, md5(text) AS payload_md5,
        |CAST(16 + ascii(substr(text,1,1)) AS INT) AS fake_width,
        |CAST(16 + ascii(substr(text,2,1)) AS INT) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q35_exists_lateship" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q47_cube" ->
      """SELECT coalesce(yr, -1) AS oyear, coalesce(pri0, 'ALL') AS pri,
        |CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice),2) AS total
        |FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority AS pri0, o_totalprice FROM orders)
        |GROUP BY CUBE (yr, pri0) ORDER BY oyear, pri""".stripMargin,
    "q48_ntile_decile" ->
      """WITH d AS (SELECT o_totalprice,
        |  CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS decile FROM orders)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |round(sum(o_totalprice),2) AS total
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,
    "q49_lag_deltas" ->
      """WITH d AS (SELECT event_type,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta,
        |  CAST(floor(epoch(ts)) AS BIGINT)
        |    - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY event_id) AS gap_sec
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_deltas,
        |round(max(delta),2) AS max_delta, round(min(delta),2) AS min_delta,
        |CAST(sum(gap_sec) AS BIGINT) AS sum_gap_sec
        |FROM d WHERE delta IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q50_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id FROM events),
        |l AS (SELECT user_id, sec, event_id,
        |  lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM e),
        |f AS (SELECT user_id, sec, event_id,
        |  CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS is_new FROM l),
        |s AS (SELECT user_id, sec, CAST(sum(is_new) OVER (
        |  PARTITION BY user_id ORDER BY sec, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_idx FROM f)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |min(sec) AS start_sec, max(sec) AS end_sec
        |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    // Streaming duals (StreamReplay): the Spark side runs the REAL
    // micro-batch engine; the oracle replays the batch-equivalent SQL.
    // q101 keeps only windows STRICTLY inside the final watermark
    // (window_end < max(ts) - 2h) on BOTH sides, so the append-mode
    // emission boundary (< vs <= the watermark) cannot flip the compare.
    "q101_stream_windowed_counts" ->
      """WITH wm AS (SELECT max(ts) AS mx FROM events)
        |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
        |FROM events, wm
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR < mx - INTERVAL 2 HOUR
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q102: mapGroupsWithState never times out within the bounded replay
    // (idle timeout 30 min of PROCESSING time), so the final per-user state
    // is the plain per-user total
    "q102_stream_sessionize" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |round(sum(value), 2) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q103: one AvailableNow batch (single source file) => the watermarked
    // dedup's surviving set is exactly the distinct key set; only key
    // columns are compared (the surviving row's other columns depend on
    // intra-batch arrival order)
    "q103_stream_dedup" ->
      """SELECT user_id, event_type FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q104: inner interval-join matches emit in the batch they arrive, so
    // the bounded replay equals the batch join; epoch-micros integers make
    // the timestamp compare exact on both engines
    "q104_stream_interval_join" ->
      """SELECT p.user_id AS user_id, epoch_us(p.ts) AS p_us,
        |round(p.value, 2) AS p_value, epoch_us(e.ts) AS e_us
        |FROM events p JOIN events e
        |ON p.event_type = 'purchase' AND e.event_type = 'error'
        |AND e.user_id = p.user_id
        |AND e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts <= p.ts
        |ORDER BY 1, 2, 4, 3""".stripMargin,
    // q106: q104's matches plus null-extended purchases; a null row is kept
    // only when p_ts sits STRICTLY below wm - 1h (wm = min-policy final
    // watermark = least(max purchase ts, max error ts) - 2h) — one full
    // join-interval of margin, so the engine's state-eviction boundary
    // (somewhere in [wm - 1h, wm], < vs <=) cannot flip the compare; the
    // replay applies the identical cut (StreamReplay scaladoc)
    "q106_stream_left_outer" ->
      """WITH p AS (SELECT user_id, ts, epoch_us(ts) AS us, value FROM events WHERE event_type = 'purchase'),
        |er AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events WHERE event_type = 'error'),
        |wm AS (SELECT least((SELECT max(us) FROM p), (SELECT max(us) FROM er))
        |  - 7200000000 AS wm_us),
        |j AS (SELECT p.user_id, p.us AS p_us, round(p.value, 2) AS p_value, er.us AS e_us
        |  FROM p JOIN er ON er.user_id = p.user_id
        |    AND er.us >= p.us - 3600000000 AND er.us <= p.us),
        |unmatched AS (SELECT p.user_id, p.us AS p_us, round(p.value, 2) AS p_value,
        |  CAST(-1 AS BIGINT) AS e_us
        |  FROM p, wm WHERE p.us < wm.wm_us - 3600000000
        |    AND NOT EXISTS (SELECT 1 FROM er WHERE er.user_id = p.user_id
        |      AND er.us >= p.us - 3600000000 AND er.us <= p.us))
        |SELECT user_id, p_us, p_value, e_us FROM j
        |UNION ALL SELECT user_id, p_us, p_value, e_us FROM unmatched
        |ORDER BY user_id, p_us, e_us, p_value""".stripMargin,
    // q107: q106's margin discipline on BOTH sides — null-error rows wait
    // out the error side's eviction boundary (wm passes e_ts + 1h), so
    // their cut sits one interval lower (e_us < wm - 2h); null-purchase
    // rows use q106's cut (p_us < wm - 1h)
    "q107_stream_full_outer" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us, value FROM events WHERE event_type = 'purchase'),
        |er AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'),
        |wm AS (SELECT least((SELECT max(us) FROM p), (SELECT max(us) FROM er))
        |  - 7200000000 AS wm_us),
        |j AS (SELECT p.user_id, p.us AS p_us, round(p.value, 2) AS p_value, er.us AS e_us
        |  FROM p JOIN er ON er.user_id = p.user_id
        |    AND er.us >= p.us - 3600000000 AND er.us <= p.us),
        |up AS (SELECT p.user_id, p.us AS p_us, round(p.value, 2) AS p_value,
        |  CAST(-1 AS BIGINT) AS e_us
        |  FROM p, wm WHERE p.us < wm.wm_us - 3600000000
        |    AND NOT EXISTS (SELECT 1 FROM er WHERE er.user_id = p.user_id
        |      AND er.us >= p.us - 3600000000 AND er.us <= p.us)),
        |ue AS (SELECT er.user_id, CAST(-1 AS BIGINT) AS p_us, -1.0 AS p_value, er.us AS e_us
        |  FROM er, wm WHERE er.us < wm.wm_us - 7200000000
        |    AND NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = er.user_id
        |      AND p.us >= er.us AND p.us <= er.us + 3600000000))
        |SELECT user_id, p_us, p_value, e_us FROM j
        |UNION ALL SELECT user_id, p_us, p_value, e_us FROM up
        |UNION ALL SELECT user_id, p_us, p_value, e_us FROM ue
        |ORDER BY user_id, p_us, e_us, p_value""".stripMargin,
    // q108: stateless stream-static enrich — every purchase emits in its
    // arrival batch with dims attached; the bounded replay IS the batch join
    "q108_stream_static_join" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS p_us,
        |c.c_nationkey AS nation, c.c_mktsegment AS segment,
        |round(e.value, 2) AS value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin,
    // q105: recall@10 of the 4-probe IVF search vs exact KNN — q75's
    // deterministic centroid/probe/assignment CTEs generalized to an 8-query
    // panel (q94's panel convention), then the two top-10 sets intersect
    "q105_ann_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < 16),
        |q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 8),
        |corp AS (SELECT vec_id, emb FROM e WHERE vec_id >= 8),
        |probes AS (SELECT qid, cid FROM (
        |  SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
        |    ORDER BY list_distance(q.qe, c.cent) ASC, c.cid ASC) AS rn
        |  FROM q CROSS JOIN c) t WHERE rn <= 4),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT corp.vec_id, c.cid, row_number() OVER (PARTITION BY corp.vec_id
        |    ORDER BY list_distance(corp.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM corp CROSS JOIN c) t WHERE rn = 1),
        |scored AS (SELECT q.qid, corp.vec_id,
        |  list_inner_product(corp.emb, q.qe)
        |    / (sqrt(list_inner_product(corp.emb, corp.emb)) * sqrt(list_inner_product(q.qe, q.qe))) AS cos
        |  FROM corp CROSS JOIN q),
        |exact AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM scored) t WHERE rn <= 10),
        |ivf AS (SELECT qid, vec_id FROM (SELECT s.qid, s.vec_id,
        |    row_number() OVER (PARTITION BY s.qid ORDER BY s.cos DESC, s.vec_id ASC) AS rn
        |  FROM scored s JOIN assign a ON a.vec_id = s.vec_id
        |    JOIN probes pr ON pr.qid = s.qid AND pr.cid = a.bucket) t WHERE rn <= 10)
        |SELECT x.qid, CAST(10 AS BIGINT) AS k, CAST(count(i.vec_id) AS BIGINT) AS hits,
        |round(count(i.vec_id) / 10.0, 4) AS recall
        |FROM exact x LEFT JOIN ivf i ON i.qid = x.qid AND i.vec_id = x.vec_id
        |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "q51_dedup_levenshtein" ->
      """WITH d AS (SELECT doc_id, lang, text, length(text) AS len
        |  FROM documents WHERE strlen(text) = length(text))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev
        |FROM d a JOIN d b
        |ON a.lang = b.lang AND a.doc_id < b.doc_id AND abs(a.len - b.len) <= 30
        |WHERE 20 * levenshtein(a.text, b.text) <= greatest(a.len, b.len)
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q52_text_repetition" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |pt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_distinct,
        |CAST((sum(c) - count(*)) * 1000 // sum(c) AS BIGINT) AS dup_frac_mille,
        |CAST(max(c) * 1000 // sum(c) AS BIGINT) AS top_frac_mille
        |FROM pt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q53_tfidf_topterms" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY lang, tok),
        |df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY tok),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM tok),
        |s AS (SELECT lang, tf.tok AS tok, tf, df, tf * (nd * 1000000 // df) AS score
        |      FROM tf JOIN df USING (tok) CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, tok) AS INT) AS rnk FROM s)
        |SELECT lang, rnk, tok, tf, df, CAST(score AS BIGINT) AS score
        |FROM r WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    "q54_hash_split" ->
      """WITH d AS (SELECT doc_id, n_chars, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h1 FROM documents),
        |s AS (SELECT CASE WHEN h1 < 'd' THEN 'train' WHEN h1 < 'f' THEN 'val' ELSE 'test' END AS split,
        |      doc_id, n_chars FROM d)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q55_sequence_pack" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  md5('seed42-' || CAST(doc_id AS VARCHAR)) AS skey FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  sum(n_tokens) OVER (ORDER BY skey, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
        |SELECT CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(sum(n_tokens) AS BIGINT) AS seq_tokens, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM c GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    "q56_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
        |  FROM documents)
        |SELECT lang, rn, doc_id, n_chars FROM r WHERE rn <= 50 ORDER BY lang, rn""".stripMargin,
    "q57_range_bucket_join" ->
      """SELECT a.event_id, CAST(count(b.event_id) AS BIGINT) AS n_nearby
        |FROM events a LEFT JOIN events b
        |  ON b.event_type = 'error' AND a.user_id = b.user_id
        |  AND abs(CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)) <= 300
        |WHERE a.event_type = 'purchase'
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,
    "q58_label_centroids" ->
      """WITH x AS (SELECT label, CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
        |  CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings)
        |SELECT label, pos, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sum_e6
        |FROM x GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q59_mm_frame_sample" ->
      """WITH a AS (SELECT doc_id AS id, 1 + strlen(text) % 31 AS n_frames,
        |  16 + ascii(substr(text, 1, 1)) AS w, 16 + ascii(substr(text, 2, 1)) AS h FROM documents),
        |f AS (SELECT id, unnest(generate_series(0, n_frames - 1, 5)) AS frame_idx, w, h FROM a)
        |SELECT id, CAST(frame_idx AS INT) AS frame_idx, CAST(frame_idx * 40 AS BIGINT) AS ts_ms,
        |CAST(w // 2 AS INT) AS out_w, CAST(h // 2 AS INT) AS out_h
        |FROM f ORDER BY id, frame_idx""".stripMargin,
    "q84_mm_png_decode" ->
      """SELECT doc_id AS id, CAST(16 + doc_id % 48 AS INT) AS width,
        |CAST(16 + (doc_id * 7) % 32 AS INT) AS height,
        |CAST(doc_id % 256 AS INT) AS px00
        |FROM documents ORDER BY id""".stripMargin,
    "q85_audio_decode" ->
      """WITH d AS (SELECT doc_id AS id, 64 + doc_id % 192 AS n FROM documents),
        |s AS (SELECT id, n, unnest(generate_series(0, CAST(n - 1 AS INT))) AS i FROM d)
        |SELECT id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
        |CAST(n AS BIGINT) AS n_frames,
        |CAST(sum((id * 131 + i * 17) % 4096 - 2048) AS BIGINT) AS pcm_sum
        |FROM s GROUP BY id, n ORDER BY id""".stripMargin,
    "q86_video_frame_decode" ->
      """WITH d AS (SELECT doc_id AS id, 1 + doc_id % 24 AS nf FROM documents),
        |f AS (SELECT id, unnest(generate_series(0, CAST(nf - 1 AS INT), 5)) AS fi FROM d)
        |SELECT id, CAST(fi AS INT) AS frame_idx, CAST(8 + id % 16 AS INT) AS width,
        |CAST(8 + fi % 8 AS INT) AS height, CAST((id + fi * 13) % 256 AS INT) AS px00
        |FROM f ORDER BY id, frame_idx""".stripMargin,
    "q87_sq_quantize" ->
      """WITH x AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |mm AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM x GROUP BY pos),
        |c AS (SELECT vec_id, CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
        |    ELSE CAST(round((v - mn) * 255 / (mx - mn)) AS BIGINT) END AS code
        |  FROM x JOIN mm ON x.pos = mm.pos)
        |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
        |CAST(min(code) AS INT) AS code_min, CAST(max(code) AS INT) AS code_max
        |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // q88: same deterministic centroid/assignment CTEs as q75, then
    // within-bucket pairs and a (cos DESC, kept ASC) pick per dropped id
    "q88_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < 16),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT e.vec_id AS vec_id, c.cid AS cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_distance(e.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM e CROSS JOIN c) t WHERE rn = 1),
        |ea AS (SELECT e.vec_id, a.bucket, e.emb, sqrt(list_inner_product(e.emb, e.emb)) AS nrm
        |  FROM e JOIN assign a USING (vec_id)),
        |p AS (SELECT x.bucket AS bucket, x.vec_id AS a, y.vec_id AS b,
        |  list_inner_product(x.emb, y.emb) / (x.nrm * y.nrm) AS c
        |  FROM ea x JOIN ea y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        |  WHERE list_inner_product(x.emb, y.emb) / (x.nrm * y.nrm) >= 0.35),
        |r AS (SELECT b AS dropped, bucket, a AS kept, c,
        |  row_number() OVER (PARTITION BY b ORDER BY c DESC, a ASC) AS rn FROM p)
        |SELECT dropped, CAST(bucket AS INT) AS bucket, kept, round(c, 4) AS cos
        |FROM r WHERE rn = 1 ORDER BY dropped""".stripMargin,
    "q89_bigram_surprisal" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |bg AS (SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
        |  FROM (SELECT doc_id, arr, unnest(range(1, len(arr))) AS i FROM tok WHERE len(arr) >= 2)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
        |sc AS (SELECT bg.doc_id, (c1.c1 * 1000000 // c2.c2) AS rarity
        |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |CAST(sum(rarity) // count(*) AS BIGINT) AS mean_rarity_ppm,
        |CAST(max(rarity) AS BIGINT) AS max_rarity_ppm
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q109: per-(doc, n) duplicate-n-gram fraction and top-n-gram token
    // fraction, n = 2,3,4 — exact integer permille on both engines; DuckDB
    // builds each n's grams with the q89/q90 range+slice idiom
    "q109_ngram_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |g AS (
        |  SELECT doc_id, len(arr) AS n_toks, 2 AS n,
        |    unnest(list_transform(range(1, len(arr)), i -> array_to_string(arr[i:i+1], ' '))) AS g
        |  FROM tok WHERE len(arr) >= 2
        |  UNION ALL
        |  SELECT doc_id, len(arr), 3,
        |    unnest(list_transform(range(1, len(arr) - 1), i -> array_to_string(arr[i:i+2], ' ')))
        |  FROM tok WHERE len(arr) >= 3
        |  UNION ALL
        |  SELECT doc_id, len(arr), 4,
        |    unnest(list_transform(range(1, len(arr) - 2), i -> array_to_string(arr[i:i+3], ' ')))
        |  FROM tok WHERE len(arr) >= 4),
        |c AS (SELECT doc_id, n_toks, n, g, count(*) AS c FROM g GROUP BY doc_id, n_toks, n, g),
        |a AS (SELECT doc_id, n_toks, n, sum(c) AS n_grams, count(*) AS n_distinct, max(c) AS top_c
        |  FROM c GROUP BY doc_id, n_toks, n)
        |SELECT doc_id, n, CAST(n_grams AS BIGINT) AS n_grams,
        |CAST((n_grams - n_distinct) * 1000 // n_grams AS BIGINT) AS dup_frac_mille,
        |CAST(top_c * n * 1000 // n_toks AS BIGINT) AS top_frac_mille
        |FROM a ORDER BY doc_id, n""".stripMargin,
    // q110: BM25 with odds-ratio idf — exact scaled-integer arithmetic on
    // both engines (k1 = 6/5, b = 3/4 cleared of denominators; see
    // TextOps.bm25TopK); ties broken by doc_id so the LIMIT set is total
    "q110_bm25_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |mm AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS dl FROM mm GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t_tot, CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |q AS (SELECT * FROM (VALUES ('join'), ('vector'), ('window'), ('slow'), ('spark')) AS v(tok)),
        |dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM mm JOIN q USING (tok) GROUP BY tok),
        |sc AS (SELECT mm.doc_id,
        |  CAST((44000000 * least(m, 100000) * 1000000 //
        |        (20000000 * least(m, 100000) + 6000000 + 18 * (dl * 1000000 // (t_tot // n_docs))))
        |     * least((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1), 1000000000000) // 1000000
        |    AS BIGINT) AS contrib
        |  FROM mm JOIN q USING (tok) JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms, CAST(sum(contrib) AS BIGINT) AS score_ppm
        |FROM sc GROUP BY doc_id ORDER BY score_ppm DESC, doc_id LIMIT 20""".stripMargin,
    // q111: RRF over the BM25 top-50 (q110's CTE at poolK=50) and the
    // quality-prior top-50 (q21's formula); 1e6 div (60 + rank) exact ppm
    "q111_rrf_fusion" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |mm AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS dl FROM mm GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t_tot, CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |q AS (SELECT * FROM (VALUES ('join'), ('vector'), ('window'), ('slow'), ('spark')) AS v(tok)),
        |dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM mm JOIN q USING (tok) GROUP BY tok),
        |sc AS (SELECT mm.doc_id,
        |  CAST((44000000 * least(m, 100000) * 1000000 //
        |        (20000000 * least(m, 100000) + 6000000 + 18 * (dl * 1000000 // (t_tot // n_docs))))
        |     * least((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1), 1000000000000) // 1000000
        |    AS BIGINT) AS contrib
        |  FROM mm JOIN q USING (tok) JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot),
        |bm AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_ppm
        |  FROM sc GROUP BY doc_id ORDER BY score_ppm DESC, doc_id LIMIT 50),
        |ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank_bm25 FROM bm),
        |qual AS (SELECT doc_id,
        |  CAST(round(least(1.0, length(text)/500.0)
        |    * (1.0 - CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text))
        |    * (0.5 + 0.5 * CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |        / len(string_split(text,' '))) * 1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM documents),
        |qb AS (SELECT doc_id, quality_score_k FROM qual ORDER BY quality_score_k DESC, doc_id LIMIT 50),
        |rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY quality_score_k DESC, doc_id) AS BIGINT) AS rank_quality FROM qb),
        |fused AS (SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
        |  COALESCE(rank_bm25, 0) AS rank_bm25, COALESCE(rank_quality, 0) AS rank_quality,
        |  CAST((CASE WHEN rank_bm25 IS NULL THEN 0 ELSE 1000000 // (60 + rank_bm25) END)
        |     + (CASE WHEN rank_quality IS NULL THEN 0 ELSE 1000000 // (60 + rank_quality) END) AS BIGINT) AS rrf_ppm
        |  FROM ra FULL OUTER JOIN rb USING (doc_id))
        |SELECT doc_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25,
        |  CAST(rank_quality AS BIGINT) AS rank_quality, rrf_ppm
        |FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin,
    // q112: priority sampling — u = first 60 md5 bits as bigint (Spark conv
    // == DuckDB '0x'||hex cast, verified bit-identical), priority
    // w*1e12 // (u//1e6 + 1), top-k a deterministic total order
    "q112_weighted_sample" ->
      """WITH qual AS (SELECT doc_id,
        |  CAST(round(least(1.0, length(text)/500.0)
        |    * (1.0 - CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text))
        |    * (0.5 + 0.5 * CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |        / len(string_split(text,' '))) * 1000.0, 0) AS BIGINT) AS weight
        |  FROM documents),
        |pri AS (SELECT doc_id, weight,
        |  CAST(weight * 1000000000000 //
        |    ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'ws'), 1, 15))::BIGINT // 1000000) + 1) AS BIGINT) AS pri
        |  FROM qual)
        |SELECT doc_id, weight, pri FROM pri ORDER BY pri DESC, doc_id LIMIT 25""".stripMargin,
    // q113: dense global ids — ONE total order both engines agree on
    // (md5 seeded shuffle key, doc_id tie-break); the oracle's global
    // window IS the shape the Spark side exists to avoid at scale
    "q113_dense_ids" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY md5('seed42-' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS gid
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q115: RRF over CORPUS-SIZED rankings — q111's fusion with the pool
    // limits removed (every BM25 hit ranked, every doc under the quality
    // prior ranked). The oracle's global rank windows are exactly the
    // single-task shape the Spark side's prefix-offset ranks avoid.
    "q115_rrf_corpus" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |mm AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS dl FROM mm GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t_tot, CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |q AS (SELECT * FROM (VALUES ('join'), ('vector'), ('window'), ('slow'), ('spark')) AS v(tok)),
        |dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM mm JOIN q USING (tok) GROUP BY tok),
        |sc AS (SELECT mm.doc_id,
        |  CAST((44000000 * least(m, 100000) * 1000000 //
        |        (20000000 * least(m, 100000) + 6000000 + 18 * (dl * 1000000 // (t_tot // n_docs))))
        |     * least((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1), 1000000000000) // 1000000
        |    AS BIGINT) AS contrib
        |  FROM mm JOIN q USING (tok) JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot),
        |bm AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_ppm FROM sc GROUP BY doc_id),
        |ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank_bm25 FROM bm),
        |qual AS (SELECT doc_id,
        |  CAST(round(least(1.0, length(text)/500.0)
        |    * (1.0 - CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text))
        |    * (0.5 + 0.5 * CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |        / len(string_split(text,' '))) * 1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM documents),
        |rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY quality_score_k DESC, doc_id) AS BIGINT) AS rank_quality FROM qual),
        |fused AS (SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
        |  COALESCE(rank_bm25, 0) AS rank_bm25, COALESCE(rank_quality, 0) AS rank_quality,
        |  CAST((CASE WHEN rank_bm25 IS NULL THEN 0 ELSE 1000000 // (60 + rank_bm25) END)
        |     + (CASE WHEN rank_quality IS NULL THEN 0 ELSE 1000000 // (60 + rank_quality) END) AS BIGINT) AS rrf_ppm
        |  FROM ra FULL OUTER JOIN rb USING (doc_id))
        |SELECT doc_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25,
        |  CAST(rank_quality AS BIGINT) AS rank_quality, rrf_ppm
        |FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin,
    // q116: hybrid lexical+dense — BM25 corpus rank fused with the exact
    // cosine corpus rank (q27's bit-identical dot product, unrounded:
    // the order is deterministic) on doc_id = vec_id; docs without an
    // embedding rank lexically only (absent list contributes 0)
    "q116_hybrid_retrieval" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |mm AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m FROM tok GROUP BY doc_id, tok),
        |dl AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS dl FROM mm GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t_tot, CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |q AS (SELECT * FROM (VALUES ('join'), ('vector'), ('window'), ('slow'), ('spark')) AS v(tok)),
        |dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM mm JOIN q USING (tok) GROUP BY tok),
        |sc AS (SELECT mm.doc_id,
        |  CAST((44000000 * least(m, 100000) * 1000000 //
        |        (20000000 * least(m, 100000) + 6000000 + 18 * (dl * 1000000 // (t_tot // n_docs))))
        |     * least((2*n_docs - 2*df + 1) * 1000000 // (2*df + 1), 1000000000000) // 1000000
        |    AS BIGINT) AS contrib
        |  FROM mm JOIN q USING (tok) JOIN dfx USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot),
        |bm AS (SELECT doc_id, CAST(sum(contrib) AS BIGINT) AS score_ppm FROM sc GROUP BY doc_id),
        |ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS rank_bm25 FROM bm),
        |cosd AS (SELECT vec_id, list_inner_product(embedding::DOUBLE[], qv.qe)
        |    /(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))*sqrt(list_inner_product(qv.qe, qv.qe))) AS cos
        |  FROM embeddings, (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) qv
        |  WHERE vec_id <> 0),
        |rd AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank_dense FROM cosd),
        |fused AS (SELECT COALESCE(ra.doc_id, rd.doc_id) AS doc_id,
        |  COALESCE(rank_bm25, 0) AS rank_bm25, COALESCE(rank_dense, 0) AS rank_dense,
        |  CAST((CASE WHEN rank_bm25 IS NULL THEN 0 ELSE 1000000 // (60 + rank_bm25) END)
        |     + (CASE WHEN rank_dense IS NULL THEN 0 ELSE 1000000 // (60 + rank_dense) END) AS BIGINT) AS rrf_ppm
        |  FROM ra FULL OUTER JOIN rd USING (doc_id))
        |SELECT doc_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25,
        |  CAST(rank_dense AS BIGINT) AS rank_dense, rrf_ppm
        |FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin,
    // q117: the production hybrid — dense leg from the q75 IVF replay
    // (probes, assignment, round-6 exact re-rank) bounded to a 100-row
    // pool, lexical leg the corpus BM25 rank; q75's `q` renamed qv to
    // avoid the BM25 query-term CTE
    "q117_hybrid_ann" ->
      ("WITH " + Bm25RankCtes +
        """,
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < 16),
        |qv AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
        |probes AS (SELECT cid FROM c, qv ORDER BY list_distance(cent, qe) ASC, cid ASC LIMIT 4),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT e.vec_id AS vec_id, c.cid AS cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_distance(e.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM e CROSS JOIN c) t WHERE rn = 1),
        |pool AS (SELECT e.vec_id AS vec_id,
        |  round(list_inner_product(e.emb, qv.qe)
        |    / (sqrt(list_inner_product(e.emb, e.emb)) * sqrt(list_inner_product(qv.qe, qv.qe))), 6) AS cos
        |  FROM e JOIN assign a ON e.vec_id = a.vec_id CROSS JOIN qv
        |  WHERE e.vec_id <> 0 AND a.bucket IN (SELECT cid FROM probes)
        |  ORDER BY cos DESC, vec_id LIMIT 100),
        |rd AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank_dense FROM pool),
        |fused AS (SELECT COALESCE(ra.doc_id, rd.doc_id) AS doc_id,
        |  COALESCE(rank_bm25, 0) AS rank_bm25, COALESCE(rank_dense, 0) AS rank_dense,
        |  CAST((CASE WHEN rank_bm25 IS NULL THEN 0 ELSE 1000000 // (60 + rank_bm25) END)
        |     + (CASE WHEN rank_dense IS NULL THEN 0 ELSE 1000000 // (60 + rank_dense) END) AS BIGINT) AS rrf_ppm
        |  FROM ra FULL OUTER JOIN rd USING (doc_id))
        |SELECT doc_id, CAST(rank_bm25 AS BIGINT) AS rank_bm25,
        |  CAST(rank_dense AS BIGINT) AS rank_dense, rrf_ppm
        |FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin),
    // q118: diversity re-rank — the q116 hybrid top-50 pool keeps its
    // best-fused doc per q60 near-dup cluster (shared ClusterCte text, so
    // the cluster definition cannot drift from q60/q114); unclustered
    // docs are their own cluster
    "q118_diverse_rerank" ->
      (ClusterCte +
        """,
        |""".stripMargin + Bm25RankCtes +
        """,
        |cosd AS (SELECT vec_id, list_inner_product(embedding::DOUBLE[], qv.qe)
        |    /(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))*sqrt(list_inner_product(qv.qe, qv.qe))) AS cos
        |  FROM embeddings, (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) qv
        |  WHERE vec_id <> 0),
        |rd AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank_dense FROM cosd),
        |fused AS (SELECT COALESCE(ra.doc_id, rd.doc_id) AS doc_id,
        |  CAST((CASE WHEN rank_bm25 IS NULL THEN 0 ELSE 1000000 // (60 + rank_bm25) END)
        |     + (CASE WHEN rank_dense IS NULL THEN 0 ELSE 1000000 // (60 + rank_dense) END) AS BIGINT) AS rrf_ppm
        |  FROM ra FULL OUTER JOIN rd USING (doc_id)),
        |pool AS (SELECT doc_id, rrf_ppm FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT 50),
        |cl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster FROM reach GROUP BY s),
        |lp AS (SELECT pool.doc_id, COALESCE(cl.cluster, pool.doc_id) AS cluster, pool.rrf_ppm
        |  FROM pool LEFT JOIN cl ON pool.doc_id = cl.doc_id),
        |pick AS (SELECT doc_id, cluster, rrf_ppm,
        |  row_number() OVER (PARTITION BY cluster ORDER BY rrf_ppm DESC, doc_id) AS rn FROM lp)
        |SELECT doc_id, cluster, rrf_ppm FROM pick WHERE rn = 1
        |ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin),
    // q119: hard-negative mining — q94's batched cosine pool (16 per query,
    // 8-query panel, corpus = vec_id >= 8) minus candidates in the SAME q60
    // cluster as their query (shared ClusterCte text, so the cluster
    // definition cannot drift); unclustered ids are their own cluster
    "q119_hard_negatives" ->
      (ClusterCte +
        """,
        |cl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster FROM reach GROUP BY s),
        |ev AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |qv AS (SELECT vec_id AS qid, emb AS qe FROM ev WHERE vec_id < 8),
        |cv AS (SELECT vec_id, emb FROM ev WHERE vec_id >= 8),
        |sv AS (SELECT qv.qid, cv.vec_id,
        |  list_inner_product(cv.emb, qv.qe)
        |    / (sqrt(list_inner_product(cv.emb, cv.emb)) * sqrt(list_inner_product(qv.qe, qv.qe))) AS cos
        |  FROM cv CROSS JOIN qv),
        |pv AS (SELECT qid, vec_id, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn FROM sv),
        |pool AS (SELECT qid, vec_id, cos FROM pv WHERE rn <= 16),
        |lp AS (SELECT pool.qid, pool.vec_id, pool.cos,
        |  COALESCE(cc.cluster, pool.vec_id) AS cl_c, COALESCE(cq.cluster, pool.qid) AS cl_q
        |  FROM pool LEFT JOIN cl cc ON pool.vec_id = cc.doc_id
        |            LEFT JOIN cl cq ON pool.qid = cq.doc_id),
        |neg AS (SELECT qid, vec_id, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn2
        |  FROM lp WHERE cl_c <> cl_q)
        |SELECT qid, CAST(rn2 AS INT) AS rank, vec_id, round(cos, 6) AS cos
        |FROM neg WHERE rn2 <= 8 ORDER BY qid, rank""".stripMargin),
    // q120: canonical-by-quality — shared ClusterCte + q21's exact quality
    // formula; argmax per cluster via a (quality DESC, doc_id ASC) window
    "q120_canonical_by_quality" ->
      (ClusterCte +
        """,
        |cl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster FROM reach GROUP BY s),
        |qd AS (SELECT doc_id, text,
        |  CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text) AS punct_r,
        |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_r
        |  FROM documents),
        |qs AS (SELECT doc_id,
        |  CAST(round(least(1.0, length(text)/500.0)*(1.0-punct_r)*(0.5+0.5*stop_r)*1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM qd),
        |m AS (SELECT cl.cluster, qs.doc_id, qs.quality_score_k,
        |  row_number() OVER (PARTITION BY cl.cluster ORDER BY qs.quality_score_k DESC, qs.doc_id ASC) AS rn,
        |  count(*) OVER (PARTITION BY cl.cluster) AS n_members
        |  FROM cl JOIN qs USING (doc_id))
        |SELECT cluster, doc_id AS canonical_doc_id, quality_score_k AS canonical_quality_k,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM m WHERE rn = 1 ORDER BY cluster""".stripMargin),
    // q122: rank-aware ANN eval — q105's CTEs with ranks kept on the IVF
    // leg; first-hit/MRR/head-precision in exact integer arithmetic
    "q122_ann_rank_eval" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < 16),
        |q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 8),
        |corp AS (SELECT vec_id, emb FROM e WHERE vec_id >= 8),
        |probes AS (SELECT qid, cid FROM (
        |  SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
        |    ORDER BY list_distance(q.qe, c.cent) ASC, c.cid ASC) AS rn
        |  FROM q CROSS JOIN c) t WHERE rn <= 4),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT corp.vec_id, c.cid, row_number() OVER (PARTITION BY corp.vec_id
        |    ORDER BY list_distance(corp.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM corp CROSS JOIN c) t WHERE rn = 1),
        |scored AS (SELECT q.qid, corp.vec_id,
        |  list_inner_product(corp.emb, q.qe)
        |    / (sqrt(list_inner_product(corp.emb, corp.emb)) * sqrt(list_inner_product(q.qe, q.qe))) AS cos
        |  FROM corp CROSS JOIN q),
        |exact AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn
        |  FROM scored) t WHERE rn <= 10),
        |ivf AS (SELECT qid, vec_id, rn FROM (SELECT s.qid, s.vec_id,
        |    row_number() OVER (PARTITION BY s.qid ORDER BY s.cos DESC, s.vec_id ASC) AS rn
        |  FROM scored s JOIN assign a ON a.vec_id = s.vec_id
        |    JOIN probes pr ON pr.qid = s.qid AND pr.cid = a.bucket) t WHERE rn <= 10),
        |m AS (SELECT i.qid,
        |  COALESCE(MIN(CASE WHEN x.vec_id IS NOT NULL THEN i.rn END), 0) AS first_hit_rank,
        |  CAST(SUM(CASE WHEN x.vec_id IS NOT NULL AND i.rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_5,
        |  CAST(COUNT(x.vec_id) AS BIGINT) AS hits_at_k
        |  FROM ivf i LEFT JOIN exact x ON x.qid = i.qid AND x.vec_id = i.vec_id
        |  GROUP BY i.qid)
        |SELECT qid, CAST(first_hit_rank AS BIGINT) AS first_hit_rank,
        |  CAST(CASE WHEN first_hit_rank > 0 THEN 1000000 // first_hit_rank ELSE 0 END AS BIGINT) AS rr_ppm,
        |  hits_at_5, hits_at_k
        |FROM m ORDER BY qid""".stripMargin,
    // q121: IVF cell stats — q105's centroid/assignment CTEs + e6-integer
    // distortion (q95's quantization convention, exact on both engines)
    "q121_ivf_cell_stats" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < 16),
        |corp AS (SELECT vec_id, emb FROM e WHERE vec_id <> 0),
        |assign AS (SELECT vec_id, emb, cid AS bucket, cent FROM (
        |  SELECT corp.vec_id, corp.emb, c.cid, c.cent, row_number() OVER (PARTITION BY corp.vec_id
        |    ORDER BY list_distance(corp.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM corp CROSS JOIN c) t WHERE rn = 1),
        |d AS (SELECT bucket, CAST(list_sum(list_transform(range(1, len(emb) + 1), i ->
        |    (CAST(round(emb[i] * 1000000) AS BIGINT) - CAST(round(cent[i] * 1000000) AS BIGINT))
        |    * (CAST(round(emb[i] * 1000000) AS BIGINT) - CAST(round(cent[i] * 1000000) AS BIGINT)))) AS BIGINT) AS d2
        |  FROM assign)
        |SELECT CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(d2) AS BIGINT) AS inertia_e12, CAST(max(d2) AS BIGINT) AS max_d2_e12
        |FROM d GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q90_contamination_overlap" ->
      """WITH d AS (SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h1 FROM documents),
        |tok AS (SELECT doc_id, h1, string_split(text, ' ') AS arr FROM d),
        |g AS (SELECT DISTINCT doc_id, h1, unnest(list_transform(range(1, len(arr) - 6), i ->
        |  arr[i]||' '||arr[i+1]||' '||arr[i+2]||' '||arr[i+3]||' '||arr[i+4]||' '||arr[i+5]||' '||arr[i+6]||' '||arr[i+7])) AS g
        |  FROM tok WHERE len(arr) >= 8),
        |tr AS (SELECT doc_id, g FROM g WHERE h1 < 'd'),
        |te AS (SELECT DISTINCT g FROM g WHERE h1 >= 'f'),
        |den AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM tr GROUP BY doc_id),
        |hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits FROM tr JOIN te USING (g) GROUP BY doc_id)
        |SELECT den.doc_id, den.n_shingles, CAST(coalesce(hit.n_hits, 0) AS BIGINT) AS n_hits,
        |CAST(coalesce(hit.n_hits, 0) * 1000000 // den.n_shingles AS BIGINT) AS overlap_ppm
        |FROM den LEFT JOIN hit ON den.doc_id = hit.doc_id ORDER BY den.doc_id""".stripMargin,
    "q91_quality_classifier" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |f AS (SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_toks,
        |  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(toks) AS stop_r,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text) AS punct_r,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text) AS digit_r,
        |  least(CAST(len(toks) AS DOUBLE), 500.0) / 500.0 AS len_sat
        |  FROM d),
        |z AS (SELECT doc_id, n_toks,
        |  -0.25 + 2.5 * stop_r + 0.8 * len_sat - 3.0 * punct_r - 2.0 * digit_r AS z FROM f)
        |SELECT doc_id, n_toks, CAST(round(z * 1000) AS BIGINT) AS logit_milli, z > 0 AS keep
        |FROM z ORDER BY doc_id""".stripMargin,
    // q92: e6-integer PQ — same systematic codebook as the IVF oracle,
    // exact integer subspace distances, (d2, j) argmin per (vec, subspace).
    // The codebook is TRAINED: q92's oracle replays the four integer-Lloyd
    // rounds from scratch (pqTrainCtes) and its comparison covers every
    // codeword, so training stays independently verified; q95/q99/q100
    // then READ the Verify-written codebook parquet (pqCachedCb) instead of
    // replaying training three more times — the sf0.1 training replay costs
    // ~2 min in DuckDB, so this cuts the PQ oracle block ~4x (r5 item 8).
    "q92_pq_quantize" ->
      s"""WITH $pqTrainCtes,
        |e AS (SELECT vec_id,
        |  list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe FROM embeddings),
        |sub AS (SELECT vec_id, qe, unnest(range(0, 32)) AS s FROM e),
        |d AS (SELECT sub.vec_id AS vec_id, sub.s AS s, cb.j AS j,
        |  list_sum(list_transform(range(1, 3), i ->
        |    (qe[s * 2 + i] - cw[s * 2 + i]) * (qe[s * 2 + i] - cw[s * 2 + i]))) AS d2
        |  FROM sub CROSS JOIN cb),
        |a AS (SELECT vec_id, s, j, d2,
        |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, j ASC) AS rn FROM d)
        |SELECT vec_id,
        |CAST(sum(CAST(j AS BIGINT) * (s + 1)) AS BIGINT) AS code_sum,
        |CAST(min(j) AS INT) AS code_min, CAST(max(j) AS INT) AS code_max,
        |CAST(sum(d2) AS BIGINT) AS pq_err_e12
        |FROM a WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // q100: q95's ADC CTEs cut at 100, then exact cosine over the shortlist
    "q100_pq_refine" ->
      s"""WITH $pqCachedCb,
        |e AS (SELECT vec_id,
        |  list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe FROM embeddings),
        |qv AS (SELECT qe AS q FROM e WHERE vec_id = 0),
        |lut AS (SELECT s, j,
        |  list_sum(list_transform(range(1, 3), i ->
        |    (q[s * 2 + i] - cw[s * 2 + i]) * (q[s * 2 + i] - cw[s * 2 + i]))) AS d2
        |  FROM (SELECT unnest(range(0, 32)) AS s) CROSS JOIN cb CROSS JOIN qv),
        |sub AS (SELECT vec_id, qe, unnest(range(0, 32)) AS s FROM e WHERE vec_id <> 0),
        |d AS (SELECT sub.vec_id AS vec_id, sub.s AS s, cb.j AS j,
        |  list_sum(list_transform(range(1, 3), i ->
        |    (qe[s * 2 + i] - cw[s * 2 + i]) * (qe[s * 2 + i] - cw[s * 2 + i]))) AS d2
        |  FROM sub CROSS JOIN cb),
        |a AS (SELECT vec_id, s, j,
        |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, j ASC) AS rn FROM d),
        |adc AS (SELECT a.vec_id, CAST(sum(lut.d2) AS BIGINT) AS adc_e12
        |  FROM a JOIN lut ON a.s = lut.s AND a.j = lut.j
        |  WHERE a.rn = 1 GROUP BY a.vec_id ORDER BY adc_e12 ASC, vec_id ASC LIMIT 100),
        |ed AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |qd AS (SELECT emb AS qq FROM ed WHERE vec_id = 0)
        |SELECT adc.vec_id AS vec_id,
        |round(list_inner_product(ed.emb, qd.qq)
        |  / (sqrt(list_inner_product(ed.emb, ed.emb)) * sqrt(list_inner_product(qd.qq, qd.qq))), 6) AS cos
        |FROM adc JOIN ed ON adc.vec_id = ed.vec_id CROSS JOIN qd
        |ORDER BY cos DESC, vec_id ASC LIMIT 20""".stripMargin,
    // q99: q75's probe/assignment CTEs composed with q95's codes + LUT,
    // ADC restricted to the probed inverted lists
    "q99_ivfpq_search" ->
      s"""WITH $pqCachedCb,
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest(count(*) // 16, 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < 16),
        |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
        |probes AS (SELECT cid FROM c, q ORDER BY list_distance(cent, qe) ASC, cid ASC LIMIT 4),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT e.vec_id AS vec_id, c.cid AS cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_distance(e.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM e CROSS JOIN c) t WHERE rn = 1),
        |e6 AS (SELECT vec_id, list_transform(emb, x -> CAST(round(x * 1000000) AS BIGINT)) AS qe6 FROM e),
        |qv AS (SELECT qe6 AS qq FROM e6 WHERE vec_id = 0),
        |lut AS (SELECT s, j,
        |  list_sum(list_transform(range(1, 3), i ->
        |    (qq[s * 2 + i] - cw[s * 2 + i]) * (qq[s * 2 + i] - cw[s * 2 + i]))) AS d2
        |  FROM (SELECT unnest(range(0, 32)) AS s) CROSS JOIN cb CROSS JOIN qv),
        |sub AS (SELECT e6.vec_id AS vec_id, qe6, unnest(range(0, 32)) AS s FROM e6
        |  JOIN assign a ON e6.vec_id = a.vec_id
        |  WHERE e6.vec_id <> 0 AND a.bucket IN (SELECT cid FROM probes)),
        |d AS (SELECT sub.vec_id AS vec_id, sub.s AS s, cb.j AS j,
        |  list_sum(list_transform(range(1, 3), i ->
        |    (qe6[s * 2 + i] - cw[s * 2 + i]) * (qe6[s * 2 + i] - cw[s * 2 + i]))) AS d2
        |  FROM sub CROSS JOIN cb),
        |a2 AS (SELECT vec_id, s, j,
        |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, j ASC) AS rn FROM d),
        |adc AS (SELECT a2.vec_id, CAST(sum(lut.d2) AS BIGINT) AS adc_e12
        |  FROM a2 JOIN lut ON a2.s = lut.s AND a2.j = lut.j WHERE a2.rn = 1 GROUP BY a2.vec_id)
        |SELECT adc.vec_id AS vec_id, asg.bucket AS bucket, adc.adc_e12 AS adc_e12
        |FROM adc JOIN assign asg ON adc.vec_id = asg.vec_id
        |ORDER BY adc_e12 ASC, vec_id ASC LIMIT 20""".stripMargin,
    // q98: the q91 gate verbatim, then q24's survivor election, q54's
    // buckets, q55's packing — per split
    "q98_pretrain_export" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |f AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  -0.25 + 2.5 * (CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(toks))
        |      + 0.8 * (least(CAST(len(toks) AS DOUBLE), 500.0) / 500.0)
        |      - 3.0 * (CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text))
        |      - 2.0 * (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)) AS z
        |  FROM d),
        |k AS (SELECT doc_id, text, n_tokens FROM f WHERE z > 0),
        |s AS (SELECT doc_id, n_tokens FROM (
        |  SELECT doc_id, n_tokens, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keep FROM k) t
        |  WHERE doc_id = keep),
        |sp AS (SELECT doc_id, n_tokens,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'f' THEN 'val' ELSE 'test' END AS split,
        |  md5('seed42-' || CAST(doc_id AS VARCHAR)) AS skey FROM s),
        |c AS (SELECT split, doc_id, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY split ORDER BY skey, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sp)
        |SELECT split, CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id,
        |CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
        |min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM c GROUP BY split, seq_id ORDER BY split, seq_id""".stripMargin,
    // q44: the raw winnowing kernel, REALLY replayed — position p's
    // Rabin-Karp hash is closed-form ([[winnowGramHash]]), selection is the
    // same bounded-frame window MIN as q97 but with the hash field widened
    // to the full unsigned 64 bits (t = uh·2^31 + (2^31−1−p) as HUGEINT;
    // min(t) = min UNSIGNED hash with rightmost tie-break, matching the
    // kernel's compareUnsigned `<=` scan), and — unlike the md5 twin — a
    // document with fewer than W hashes still emits one whole-document
    // window (`p <= greatest(pmax-15, 1)`), mirroring
    // RollingFingerprint.winnow's `lastStart = max(nHashes-W, 0)`.
    "q44_dedup_winnow" ->
      s"""WITH doc AS (SELECT doc_id, text FROM documents WHERE length(text) >= 8),
         |g AS (SELECT doc_id, p, ($winnowGramHash)%${DuckXxh64.M} AS uh
         |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS p FROM doc)),
         |h AS (SELECT doc_id, p, uh * 2147483648 + (2147483647 - p) AS t FROM g),
         |sel AS (SELECT doc_id, p,
         |  min(t) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS s,
         |  max(p) OVER (PARTITION BY doc_id) AS pmax FROM h),
         |fp AS (SELECT DISTINCT doc_id,
         |  CAST(CASE WHEN s // 2147483648 >= 9223372036854775808 THEN s // 2147483648 - ${DuckXxh64.M} ELSE s // 2147483648 END AS BIGINT) AS fp
         |  FROM sel WHERE p <= greatest(pmax - 15, 1)),
         |pr AS (SELECT doc_id, fp FROM (SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fp) t WHERE df <= 50),
         |pares AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
         |  FROM pr x JOIN pr y ON x.fp = y.fp AND x.doc_id < y.doc_id GROUP BY x.doc_id, y.doc_id)
         |SELECT a, b, shared FROM pares WHERE shared >= 10 ORDER BY a, b""".stripMargin,
    // q29: REAL xxhash64 replay ([[DuckXxh64]]) → 64-bit occurrence votes →
    // signed fingerprint + 4×16-bit chunk LSH with the bucket cap → exact
    // Hamming — the exact Spark pipeline, hash-exact at sf0.001/0.01/0.1.
    "q29_dedup_simhash" ->
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         |${DuckXxh64.xxhCtes},
         |agg AS (SELECT doc_id, list(uh) AS hs FROM xh GROUP BY doc_id),
         |fpu AS (SELECT doc_id, list_sum(list_transform(range(0,64), b ->
         |    CASE WHEN 2*CAST(list_sum(list_transform(hs, x -> CAST((x >> CAST(b AS INT)) & 1 AS BIGINT))) AS BIGINT) >= len(hs)
         |    THEN (CAST(1 AS HUGEINT) << CAST(b AS INT)) ELSE CAST(0 AS HUGEINT) END)) AS ufp FROM agg),
         |fp AS (SELECT doc_id,
         |  CAST(CASE WHEN ufp >= 9223372036854775808 THEN ufp - ${DuckXxh64.M} ELSE ufp END AS BIGINT) AS simhash, ufp FROM fpu),
         |ck AS (SELECT doc_id, simhash, CAST(c AS BIGINT) AS c, CAST((ufp >> CAST(16*c AS INT)) & 65535 AS BIGINT) AS v
         |  FROM fp, (SELECT unnest(range(0,4)) AS c)),
         |pr AS (SELECT * FROM (SELECT ck.*, count(*) OVER (PARTITION BY c, v) AS bsz FROM ck) t WHERE bsz <= 50),
         |p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |  FROM pr x JOIN pr y ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id)
         |SELECT a, b, hamming FROM p WHERE hamming <= 6 ORDER BY a, b""".stripMargin,
    // q97: md5-substrate winnowing — t = h*2^31 + (2^31-1-p) makes the
    // bounded-frame window MIN implement rightmost-minimum selection
    // (31-bit position field: t <= 2^63-1, no underflow below 2^31-1 grams)
    "q97_winnow_portable" ->
      """WITH doc AS (SELECT doc_id, text FROM documents WHERE length(text) >= 8),
        |g AS (SELECT doc_id, i AS p, md5(substr(text, i, 8)) AS mh
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) - 6)) AS i FROM doc)),
        |h AS (SELECT doc_id, p,
        |  (CAST((strpos('0123456789abcdef', mh[1])-1)*4096 + (strpos('0123456789abcdef', mh[2])-1)*256 + (strpos('0123456789abcdef', mh[3])-1)*16 + strpos('0123456789abcdef', mh[4])-1 AS BIGINT) * 65536
        |   + ((strpos('0123456789abcdef', mh[5])-1)*4096 + (strpos('0123456789abcdef', mh[6])-1)*256 + (strpos('0123456789abcdef', mh[7])-1)*16 + strpos('0123456789abcdef', mh[8])-1)) * 2147483648
        |  + (2147483647 - p) AS t FROM g),
        |sel AS (SELECT doc_id, p,
        |  min(t) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS s,
        |  max(p) OVER (PARTITION BY doc_id) AS pmax FROM h),
        |fp AS (SELECT DISTINCT doc_id, s // 2147483648 AS fp FROM sel WHERE p <= pmax - 15),
        |pr AS (SELECT doc_id, fp FROM (SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fp) t WHERE df <= 50),
        |pares AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
        |  FROM pr x JOIN pr y ON x.fp = y.fp AND x.doc_id < y.doc_id GROUP BY x.doc_id, y.doc_id)
        |SELECT a, b, shared FROM pares WHERE shared >= 10 ORDER BY a, b""".stripMargin,
    // q96: md5-hex bits -> 4x16-bit chunk votes -> bucket-capped LSH ->
    // exact Hamming, all reproduced digit-for-digit from md5(token)
    "q96_simhash_portable" ->
      """WITH d AS (SELECT doc_id, list_transform(string_split(text, ' '), t -> md5(t)) AS hx FROM documents),
        |vals AS (SELECT doc_id,
        |  list_transform(hx, h -> (strpos('0123456789abcdef', h[1])-1)*4096 + (strpos('0123456789abcdef', h[2])-1)*256 + (strpos('0123456789abcdef', h[3])-1)*16 + strpos('0123456789abcdef', h[4])-1) AS vs0,
        |  list_transform(hx, h -> (strpos('0123456789abcdef', h[5])-1)*4096 + (strpos('0123456789abcdef', h[6])-1)*256 + (strpos('0123456789abcdef', h[7])-1)*16 + strpos('0123456789abcdef', h[8])-1) AS vs1,
        |  list_transform(hx, h -> (strpos('0123456789abcdef', h[9])-1)*4096 + (strpos('0123456789abcdef', h[10])-1)*256 + (strpos('0123456789abcdef', h[11])-1)*16 + strpos('0123456789abcdef', h[12])-1) AS vs2,
        |  list_transform(hx, h -> (strpos('0123456789abcdef', h[13])-1)*4096 + (strpos('0123456789abcdef', h[14])-1)*256 + (strpos('0123456789abcdef', h[15])-1)*16 + strpos('0123456789abcdef', h[16])-1) AS vs3
        |  FROM d),
        |h AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(range(0,16), b -> CASE WHEN list_sum(list_transform(vs0, x -> ((x >> b) & 1) * 2 - 1)) >= 0 THEN (1 << b) ELSE 0 END)) AS INTEGER) AS c0,
        |  CAST(list_sum(list_transform(range(0,16), b -> CASE WHEN list_sum(list_transform(vs1, x -> ((x >> b) & 1) * 2 - 1)) >= 0 THEN (1 << b) ELSE 0 END)) AS INTEGER) AS c1,
        |  CAST(list_sum(list_transform(range(0,16), b -> CASE WHEN list_sum(list_transform(vs2, x -> ((x >> b) & 1) * 2 - 1)) >= 0 THEN (1 << b) ELSE 0 END)) AS INTEGER) AS c2,
        |  CAST(list_sum(list_transform(range(0,16), b -> CASE WHEN list_sum(list_transform(vs3, x -> ((x >> b) & 1) * 2 - 1)) >= 0 THEN (1 << b) ELSE 0 END)) AS INTEGER) AS c3
        |  FROM vals),
        |ck AS (SELECT doc_id, c0, c1, c2, c3, 0 AS c, c0 AS vv FROM h
        |  UNION ALL SELECT doc_id, c0, c1, c2, c3, 1, c1 FROM h
        |  UNION ALL SELECT doc_id, c0, c1, c2, c3, 2, c2 FROM h
        |  UNION ALL SELECT doc_id, c0, c1, c2, c3, 3, c3 FROM h),
        |pr AS (SELECT * FROM (SELECT ck.*, count(*) OVER (PARTITION BY c, vv) AS bsz FROM ck) t WHERE bsz <= 50),
        |p AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |  CAST(bit_count(xor(x.c0, y.c0)) + bit_count(xor(x.c1, y.c1)) + bit_count(xor(x.c2, y.c2)) + bit_count(xor(x.c3, y.c3)) AS BIGINT) AS hamming
        |  FROM pr x JOIN pr y ON x.c = y.c AND x.vv = y.vv AND x.doc_id < y.doc_id)
        |SELECT a, b, hamming FROM p WHERE hamming <= 6 ORDER BY a, b""".stripMargin,
    "q94_knn_batch" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 20),
        |c AS (SELECT vec_id, emb FROM e WHERE vec_id >= 20),
        |s AS (SELECT q.qid, c.vec_id,
        |  list_inner_product(c.emb, q.qe)
        |    / (sqrt(list_inner_product(c.emb, c.emb)) * sqrt(list_inner_product(q.qe, q.qe))) AS cos
        |  FROM c CROSS JOIN q),
        |r AS (SELECT qid, vec_id, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rn FROM s)
        |SELECT qid, CAST(rn - 1 AS INT) AS rank, vec_id, round(cos, 6) AS cos
        |FROM r WHERE rn <= 5 ORDER BY qid, rank""".stripMargin,
    // q95: q92's code CTEs + a query-side LUT; adc = sum of 8 LUT lookups
    "q95_pq_adc_search" ->
      s"""WITH $pqCachedCb,
        |e AS (SELECT vec_id,
        |  list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT)) AS qe FROM embeddings),
        |qv AS (SELECT qe AS q FROM e WHERE vec_id = 0),
        |lut AS (SELECT s, j,
        |  list_sum(list_transform(range(1, 3), i ->
        |    (q[s * 2 + i] - cw[s * 2 + i]) * (q[s * 2 + i] - cw[s * 2 + i]))) AS d2
        |  FROM (SELECT unnest(range(0, 32)) AS s) CROSS JOIN cb CROSS JOIN qv),
        |sub AS (SELECT vec_id, qe, unnest(range(0, 32)) AS s FROM e WHERE vec_id <> 0),
        |d AS (SELECT sub.vec_id AS vec_id, sub.s AS s, cb.j AS j,
        |  list_sum(list_transform(range(1, 3), i ->
        |    (qe[s * 2 + i] - cw[s * 2 + i]) * (qe[s * 2 + i] - cw[s * 2 + i]))) AS d2
        |  FROM sub CROSS JOIN cb),
        |a AS (SELECT vec_id, s, j,
        |  row_number() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, j ASC) AS rn FROM d),
        |adc AS (SELECT a.vec_id, CAST(sum(lut.d2) AS BIGINT) AS adc_e12
        |  FROM a JOIN lut ON a.s = lut.s AND a.j = lut.j
        |  WHERE a.rn = 1 GROUP BY a.vec_id)
        |SELECT vec_id, adc_e12 FROM adc ORDER BY adc_e12 ASC, vec_id ASC LIMIT 20""".stripMargin,
    // q93: grams are counted by their 60-bit md5-prefix hash (top 15 hex
    // digits), digit-for-digit the gram_hash20 kernel's value — the hash,
    // not the raw gram, is the join/count key on both engines
    "q93_substring_dup" ->
      """WITH g0 AS (SELECT doc_id,
        |  unnest(list_transform(range(1, length(text) - 18), i -> substr(text, i, 20))) AS gs
        |  FROM documents WHERE length(text) >= 20),
        |g AS (SELECT DISTINCT doc_id,
        |  CAST(list_sum(list_transform(range(1, 16), j ->
        |    (strpos('0123456789abcdef', substr(md5(gs), CAST(j AS INT), 1)) - 1)
        |      * CAST(pow(16, 15 - j) AS BIGINT))) AS BIGINT) AS g
        |  FROM g0),
        |dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        |den AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM g GROUP BY doc_id),
        |hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup FROM g JOIN dup USING (g) GROUP BY doc_id)
        |SELECT den.doc_id, den.n_grams, CAST(coalesce(hit.n_dup, 0) AS BIGINT) AS n_dup,
        |CAST(coalesce(hit.n_dup, 0) * 1000000 // den.n_grams AS BIGINT) AS dup_ppm
        |FROM den LEFT JOIN hit ON den.doc_id = hit.doc_id ORDER BY den.doc_id""".stripMargin,
    // q131: CCNet paragraph dedup — chunk = 16-token window, dedup key =
    // 64-bit md5 prefix of the chunk text, first (doc_id, idx) occurrence
    // wins (row_number == Spark's min-struct argmin), docs reassembled from
    // surviving chunks; md5('') aligns the all-dropped edge on both engines
    "q131_paragraph_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |ch AS (SELECT doc_id,
        |  unnest(list_transform(range(0, CAST(ceil(len(arr) / 16.0) AS BIGINT)),
        |    i -> {'idx': i, 'chunk': array_to_string(list_slice(arr, CAST(i * 16 + 1 AS BIGINT), CAST(i * 16 + 16 AS BIGINT)), ' ')})) AS c
        |  FROM tok),
        |occ AS (SELECT doc_id, c.idx AS idx, c.chunk AS chunk, substr(md5(c.chunk), 1, 16) AS h FROM ch),
        |rn AS (SELECT doc_id, idx, chunk,
        |  row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM occ)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE rn = 1), '')) AS new_hash
        |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q132: batch dual of the streaming LSH band dedup — q25's signature and
    // band CTEs verbatim; a doc collides on a band iff the bucket's
    // min(doc_id) (the stream's running owner state) is smaller than it
    "q132_stream_lsh_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS arr FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, len(arr)-1), i -> arr[i]||' '||arr[i+1]||' '||arr[i+2])) AS s
        |  FROM toks WHERE len(arr)>=3)),
        |shd AS (SELECT doc_id, md5(s) || md5('x'||s) AS d FROM sh),
        |sig AS (SELECT doc_id,
        |  min(substr(d,1,8)) h0, min(substr(d,9,8)) h1,
        |  min(substr(d,17,8)) h2, min(substr(d,25,8)) h3,
        |  min(substr(d,33,8)) h4, min(substr(d,41,8)) h5,
        |  min(substr(d,49,8)) h6, min(substr(d,57,8)) h7
        |  FROM shd GROUP BY doc_id),
        |bands AS (SELECT doc_id, '0'||h0||h1 AS bk FROM sig UNION ALL SELECT doc_id, '1'||h2||h3 FROM sig
        |  UNION ALL SELECT doc_id, '2'||h4||h5 FROM sig UNION ALL SELECT doc_id, '3'||h6||h7 FROM sig),
        |own AS (SELECT bk, min(doc_id) AS owner FROM bands GROUP BY bk)
        |SELECT b.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_bands_hit,
        |  min(o.owner) AS first_owner
        |FROM bands b JOIN own o ON b.bk = o.bk AND o.owner < b.doc_id
        |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,
    // q133: q43's quality/lang CTEs + q132's band/owner CTEs restricted to
    // the GATED set — kept corpus = gated docs with no band collision
    // against a smaller admitted doc_id
    "q133_stream_curation" ->
      """WITH q AS (SELECT doc_id, string_split(text,' ') AS toks,
        |  CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text) AS punct_r,
        |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_r,
        |  length(text) AS lt FROM documents),
        |quality AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(least(1.0, lt/500.0)*(1.0-punct_r)*(0.5+0.5*stop_r)*1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM q),
        |gated AS (SELECT doc_id, n_tokens, quality_score_k FROM quality
        |  WHERE quality_score_k >= 300 AND n_tokens >= 20),
        |c AS (SELECT doc_id,
        | len(list_filter(string_split(text,' '), x->list_contains(['the','a','of','and','to','in'],x))) AS c_en,
        | len(list_filter(string_split(text,' '), x->list_contains(['der','die','das','und','nicht'],x))) AS c_de,
        | len(list_filter(string_split(text,' '), x->list_contains(['el','la','de','y','que'],x))) AS c_es,
        | len(list_filter(string_split(text,' '), x->list_contains(['le','la','de','et','les'],x))) AS c_fr,
        | len(list_filter(string_split(text,' '), x->list_contains(['的','是','在'],x))) AS c_zh
        | FROM documents),
        |lang AS (SELECT doc_id,
        | CASE WHEN c_zh>=c_fr AND c_zh>=c_es AND c_zh>=c_en AND c_zh>=c_de THEN 'zh'
        |  WHEN c_fr>=c_es AND c_fr>=c_en AND c_fr>=c_de THEN 'fr'
        |  WHEN c_es>=c_en AND c_es>=c_de THEN 'es'
        |  WHEN c_en>=c_de THEN 'en' ELSE 'de' END AS lang_pred FROM c),
        |toksv AS (SELECT d.doc_id, string_split(d.text,' ') AS arr FROM documents d
        |  JOIN gated g ON d.doc_id = g.doc_id),
        |sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, len(arr)-1), i -> arr[i]||' '||arr[i+1]||' '||arr[i+2])) AS s
        |  FROM toksv WHERE len(arr)>=3)),
        |shd AS (SELECT doc_id, md5(s) || md5('x'||s) AS d FROM sh),
        |sig AS (SELECT doc_id,
        |  min(substr(d,1,8)) h0, min(substr(d,9,8)) h1,
        |  min(substr(d,17,8)) h2, min(substr(d,25,8)) h3,
        |  min(substr(d,33,8)) h4, min(substr(d,41,8)) h5,
        |  min(substr(d,49,8)) h6, min(substr(d,57,8)) h7
        |  FROM shd GROUP BY doc_id),
        |bands AS (SELECT doc_id, '0'||h0||h1 AS bk FROM sig UNION ALL SELECT doc_id, '1'||h2||h3 FROM sig
        |  UNION ALL SELECT doc_id, '2'||h4||h5 FROM sig UNION ALL SELECT doc_id, '3'||h6||h7 FROM sig),
        |own AS (SELECT bk, min(doc_id) AS owner FROM bands GROUP BY bk),
        |coll AS (SELECT DISTINCT b.doc_id FROM bands b
        |  JOIN own o ON b.bk = o.bk AND o.owner < b.doc_id)
        |SELECT g.doc_id AS doc_id, lang.lang_pred AS lang_pred,
        |  g.n_tokens AS n_tokens, g.quality_score_k AS quality_score_k
        |FROM gated g JOIN lang ON g.doc_id = lang.doc_id
        |WHERE g.doc_id NOT IN (SELECT doc_id FROM coll)
        |ORDER BY doc_id""".stripMargin,
    "q60_dedup_clusters" ->
      (ClusterCte +
        """
        |SELECT s AS doc_id, least(s, min(t)) AS cluster, s <= min(t) AS is_canonical
        |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin),
    // q114: q60's clusters -> inverse-size weights -> q112's priority law
    // (salt 'cb' so the sample is independent of q112's); singletons via
    // the left join get weight 1e6
    "q114_cluster_balanced_sample" ->
      (ClusterCte +
        """,
        |cl AS (SELECT s AS doc_id, least(s, min(t)) AS cluster FROM reach GROUP BY s),
        |csz AS (SELECT cluster, count(*) AS csz FROM cl GROUP BY cluster),
        |sized AS (SELECT d.doc_id, COALESCE(z.csz, 1) AS cluster_size FROM documents d
        |  LEFT JOIN (SELECT cl.doc_id, csz.csz FROM cl JOIN csz ON cl.cluster = csz.cluster) z
        |  ON d.doc_id = z.doc_id),
        |w AS (SELECT doc_id, cluster_size, CAST(1000000 // cluster_size AS BIGINT) AS weight FROM sized),
        |pri AS (SELECT doc_id, cluster_size, weight,
        |  CAST(weight * 1000000000000 //
        |    ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'cb'), 1, 15))::BIGINT // 1000000) + 1) AS BIGINT) AS pri
        |  FROM w)
        |SELECT doc_id, cluster_size, weight, pri FROM pri ORDER BY pri DESC, doc_id LIMIT 25""".stripMargin),
    "q61_decontaminate" ->
      """WITH d AS (SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h1 FROM documents),
        |tok AS (SELECT doc_id, h1, string_split(text, ' ') AS arr FROM d),
        |g AS (SELECT DISTINCT doc_id, h1, unnest(list_transform(range(1, len(arr) - 6), i ->
        |  arr[i]||' '||arr[i+1]||' '||arr[i+2]||' '||arr[i+3]||' '||arr[i+4]||' '||arr[i+5]||' '||arr[i+6]||' '||arr[i+7])) AS g
        |  FROM tok WHERE len(arr) >= 8),
        |tr AS (SELECT doc_id, g FROM g WHERE h1 < 'd'),
        |te AS (SELECT doc_id AS tdoc, g FROM g WHERE h1 >= 'f')
        |SELECT tr.doc_id, CAST(count(DISTINCT te.tdoc) AS BIGINT) AS n_test_hits
        |FROM tr JOIN te USING (g) GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // the bloom pre-filter is exact after the verify join, so q70's oracle is
    // the same exhaustive-join SQL as q61's
    "q70_decontaminate_bloom" ->
      """WITH d AS (SELECT doc_id, text, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h1 FROM documents),
        |tok AS (SELECT doc_id, h1, string_split(text, ' ') AS arr FROM d),
        |g AS (SELECT DISTINCT doc_id, h1, unnest(list_transform(range(1, len(arr) - 6), i ->
        |  arr[i]||' '||arr[i+1]||' '||arr[i+2]||' '||arr[i+3]||' '||arr[i+4]||' '||arr[i+5]||' '||arr[i+6]||' '||arr[i+7])) AS g
        |  FROM tok WHERE len(arr) >= 8),
        |tr AS (SELECT doc_id, g FROM g WHERE h1 < 'd'),
        |te AS (SELECT doc_id AS tdoc, g FROM g WHERE h1 >= 'f')
        |SELECT tr.doc_id, CAST(count(DISTINCT te.tdoc) AS BIGINT) AS n_test_hits
        |FROM tr JOIN te USING (g) GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    "q71_mixture_sample" ->
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_in FROM documents GROUP BY source, lang),
        |m AS (SELECT min(n_in) AS mc FROM c),
        |t AS (SELECT source, lang, n_in,
        |      CAST(floor(1048576 * sqrt(CAST(mc AS DOUBLE) / n_in)) AS BIGINT) AS thr FROM c CROSS JOIN m),
        |k AS (SELECT d.source, d.lang, d.doc_id FROM documents d JOIN t USING (source, lang)
        |      WHERE thr >= 1048576 OR substr(md5('mix-' || CAST(d.doc_id AS VARCHAR)), 1, 5) < lpad(lower(to_hex(thr)), 5, '0')),
        |g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_kept FROM k GROUP BY source, lang)
        |SELECT t.source, t.lang, t.n_in, t.thr, COALESCE(g.n_kept, 0) AS n_kept
        |FROM t LEFT JOIN g USING (source, lang) ORDER BY source, lang""".stripMargin,
    "q72_vocab_coverage" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |t1 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab FROM tok GROUP BY source),
        |bg AS (SELECT source, unnest(list_transform(range(1, len(string_split(text, ' '))),
        |       i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bg FROM documents),
        |t2 AS (SELECT source, CAST(count(DISTINCT bg) AS BIGINT) AS n_bigram_vocab FROM bg GROUP BY source),
        |d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source)
        |SELECT t1.source, n_docs, n_tokens, n_vocab, n_bigram_vocab,
        |CAST(n_vocab * 1000 // n_tokens AS BIGINT) AS ttr_mille
        |FROM t1 JOIN t2 USING (source) JOIN d USING (source) ORDER BY source""".stripMargin,
    "q73_length_clip" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n FROM documents)
        |SELECT source, max(n) AS n_in, CAST(count(*) AS BIGINT) AS n_kept,
        |CAST(sum(n_chars) AS BIGINT) AS kept_chars, min(n_chars) AS min_kept, max(n_chars) AS max_kept
        |FROM r WHERE rn > CAST(floor(n * 0.05) AS BIGINT) AND rn <= n - CAST(floor(n * 0.05) AS BIGINT)
        |GROUP BY source ORDER BY source""".stripMargin,
    "q82_tpch5_sql" -> RelationalOps.TpchQ5Sql,
    "q83_unigram_surprisal" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY tok),
        |n AS (SELECT CAST(sum(tf) AS BIGINT) AS nt FROM tf),
        |sc AS (SELECT t.doc_id, (nt * 1000000 // tf.tf) AS rarity
        |       FROM tok t JOIN tf USING (tok) CROSS JOIN n)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(sum(rarity) // count(*) AS BIGINT) AS mean_rarity_ppm,
        |CAST(max(rarity) AS BIGINT) AS max_rarity_ppm
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q81_salted_join" ->
      """SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_events,
        |CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY c.c_mktsegment ORDER BY segment""".stripMargin,
    "q78_sliding_window" ->
      """WITH w AS (SELECT time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes') AS ws,
        |  event_type, value FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
        |SELECT CAST(floor(epoch(ws)) AS BIGINT) AS ws_sec, event_type, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM w GROUP BY ws, event_type ORDER BY ws_sec, event_type""".stripMargin,
    "q79_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL '24 hours' GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL '24 hours' GROUP BY e.user_id)
        |SELECT s1.user_id, CAST(floor(epoch(s1.t1)) AS BIGINT) AS t1_sec,
        |CAST(floor(epoch(s2.t2)) AS BIGINT) AS t2_sec, CAST(floor(epoch(s3.t3)) AS BIGINT) AS t3_sec
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id) ORDER BY s1.user_id""".stripMargin,
    "q80_retention_cohorts" ->
      """WITH fp AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |            FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_no,
        |CAST(count(*) AS BIGINT) AS n_active
        |FROM fp JOIN act USING (user_id) WHERE wk >= cohort
        |GROUP BY fp.cohort, week_no ORDER BY cohort, week_no""".stripMargin,
    "q76_chunk_split" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |s AS (SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS start FROM d)
        |SELECT doc_id, start // 48 AS chunk_id,
        |least(64, n - start) AS n_chunk_tokens,
        |md5(array_to_string(list_slice(toks, start + 1, start + least(64, n - start)), ' ')) AS chunk_fp
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "q77_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS h1,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp FROM documents),
        |o AS (SELECT DISTINCT fp FROM d WHERE h1 < 'c'),
        |n AS (SELECT doc_id, source, fp FROM d WHERE h1 >= 'c')
        |SELECT n.doc_id, n.source, (o.fp IS NOT NULL) AS is_dup
        |FROM n LEFT JOIN o USING (fp) ORDER BY n.doc_id""".stripMargin,
    "q74_pii_redact" ->
      """WITH aug AS (SELECT doc_id,
        |  text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com call +1-' ||
        |  CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' now' AS aug
        |  FROM documents),
        |red AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '\+1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |                 '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS red
        |  FROM aug)
        |SELECT doc_id, n_emails, n_phones, right(red, 40) AS red_tail, md5(red) AS red_fp
        |FROM red ORDER BY doc_id""".stripMargin,
    "q62_joint_curation" ->
      """WITH q AS (SELECT doc_id, text, string_split(text,' ') AS toks,
        |  CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text) AS punct_r,
        |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_r
        |  FROM documents),
        |qs AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(round(least(1.0, length(text)/500.0)*(1.0-punct_r)*(0.5+0.5*stop_r)*1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM q),
        |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
        |st AS (SELECT greatest((count(*) + 124) // 125, 1) AS k,
        |  greatest(count(*) // greatest((count(*) + 124) // 125, 1), 1) AS step FROM e),
        |c AS (SELECT CAST(vec_id // step AS INT) AS cid, emb AS cent FROM e, st
        |  WHERE vec_id % step = 0 AND vec_id // step < k),
        |assign AS (SELECT vec_id, cid AS bucket FROM (
        |  SELECT e.vec_id AS vec_id, c.cid AS cid,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY list_distance(e.emb, c.cent) ASC, c.cid ASC) AS rn
        |  FROM e CROSS JOIN c) t WHERE rn = 1),
        |ea AS (SELECT e.vec_id, e.label, a.bucket, e.emb FROM e JOIN assign a USING (vec_id)),
        |losers AS (SELECT DISTINCT y.vec_id AS vec_id FROM ea x JOIN ea y
        |  ON x.label=y.label AND x.bucket=y.bucket AND x.vec_id<y.vec_id
        |  WHERE list_inner_product(x.emb,y.emb)/(sqrt(list_inner_product(x.emb,x.emb))*sqrt(list_inner_product(y.emb,y.emb))) >= 0.35)
        |SELECT qs.doc_id, e2.label, qs.quality_score_k
        |FROM qs JOIN embeddings e2 ON e2.vec_id = qs.doc_id
        |WHERE qs.quality_score_k >= 300 AND qs.n_tokens >= 20
        |  AND qs.doc_id NOT IN (SELECT vec_id FROM losers)
        |ORDER BY qs.doc_id""".stripMargin,
    "q63_ewma" ->
      """WITH w AS (SELECT event_id, event_type, value,
        |  list(value) OVER (PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
        |  FROM events)
        |SELECT event_id, event_type,
        |CAST(round(list_sum(list_transform(range(len(vals)), i ->
        |  vals[i+1] * pow(0.5, len(vals) - 1 - i))) * 100) AS BIGINT) AS ewma_cents
        |FROM w ORDER BY event_id""".stripMargin,
    "q64_unpivot" ->
      """SELECT measure, CAST(count(*) AS BIGINT) AS n, min(val) AS mn, max(val) AS mx,
        |round(sum(val), 2) AS total
        |FROM (
        |  SELECT 'discount' AS measure, l_discount AS val FROM lineitem
        |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'quantity', l_quantity FROM lineitem
        |  UNION ALL SELECT 'tax', l_tax FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin,
    "q65_daily_active" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |CAST(count(DISTINCT user_id) AS BIGINT) AS dau,
        |CAST(count(*) AS BIGINT) AS n_events,
        |round(sum(value), 2) AS total_value
        |FROM events GROUP BY day ORDER BY day""".stripMargin,
    "q66_value_histogram" ->
      """SELECT CAST(floor(value / 10.0) AS INT) + 1 AS bucket,
        |CAST(count(*) AS BIGINT) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q67_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |CAST(count(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q68_source_report" ->
      """WITH q AS (SELECT doc_id, text, string_split(text,' ') AS toks,
        |  CAST(len(regexp_extract_all(text,'[^A-Za-z0-9 ]')) AS DOUBLE)/length(text) AS punct_r,
        |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE)
        |    / len(string_split(text,' ')) AS stop_r
        |  FROM documents),
        |qs AS (SELECT doc_id,
        |  CAST(round(least(1.0, length(text)/500.0)*(1.0-punct_r)*(0.5+0.5*stop_r)*1000.0, 0) AS BIGINT) AS quality_score_k
        |  FROM q)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
        |CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
        |CAST(sum(qs.quality_score_k) // count(*) AS BIGINT) AS mean_quality_k
        |FROM documents d JOIN qs ON qs.doc_id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin
  )
}
