package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Stream-replay bridge: runs the [[StreamingOps]] transforms as REAL
 * Structured Streaming queries (readStream → watermark/state → memory sink,
 * `Trigger.AvailableNow`) over the bounded testdata, awaits completion, and
 * returns the sink as a DataFrame — which gives the streaming tier
 * CORRECTNESS rows against the DuckDB oracle (VERDICT r7 #3) instead of
 * ScalaTest-only coverage. The oracle replays the batch dual in SQL; the
 * Spark side exercises the actual micro-batch engine, watermark eviction,
 * and state store.
 *
 * Determinism notes:
 *  - The whole events file arrives in micro-batch 0 (FileStreamSource, no
 *    maxFilesPerTrigger cap), so the final watermark is max(ts) - delay.
 *  - Append mode emits a window when the watermark passes its END; whether
 *    the boundary is < or <= is engine detail, so both the returned frame
 *    and the oracle keep only windows STRICTLY inside the watermark
 *    (window_end < max_ts - delay) — unambiguous under either inequality.
 *  - Update-mode sinks receive one row per (key, batch-with-changes); the
 *    final state per key is selected by max(n_events) (monotone across
 *    updates), making the result independent of how the engine happened to
 *    split batches.
 */
object StreamReplay {
  // memory-sink names must be unique per run: Bench re-executes each query
  // 4x per process and a duplicate queryName is a start() error
  private val runId = new AtomicLong(0L)

  /** Shuffle/state partition count for the bounded replays. The session
   * default (32, sized for the batch suite) multiplies the stateful
   * replays' per-trigger commit floor by 8x over what ~40k buffered rows
   * need: every trigger commits `partitions x stores-per-partition` state
   * stores regardless of data volume (VERDICT r10 #2 — the floor scales
   * with partitions, not data). 4 partitions keep the replays parallel
   * while cutting the floor; at deployment the partition count is sized to
   * per-trigger volume, which is exactly what this does for the bounded
   * testdata. Env-overridable for A/B. */
  private val replayPartitions: Int =
    sys.env.getOrElse("SPARK_GRAFT_REPLAY_PARTITIONS", "4").toInt

  /** The watermark pull the outer-join replays cut by: max event timestamp
   * of one type, as EXACT epoch MICROS. The oracle cuts at epoch_us, and a
   * `getTimestamp.getTime` pull would ms-truncate the cutoff up to 999 us
   * below the oracle's — a purchase in that sliver would mismatch
   * (ADVICE r10; the exactness is property-pinned by R12FixProps over
   * generated sub-ms slivers). */
  private[graft] def maxEventTsUs(ev: DataFrame, kind: String): Long =
    ev.filter(col("event_type") === kind)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)

  /** min(max purchase ts, max error ts) in ONE pass (r17): the outer-join
   * replays previously ran two separate driver aggregations for the two
   * sides' maxima — same exact-micros semantics, one scan instead of two. */
  private def minOfSideMaxUs(ev: DataFrame): Long = {
    val r = ev.filter(col("event_type").isin("purchase", "error"))
      .agg(
        max(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p"),
        max(when(col("event_type") === "error", unix_micros(col("ts")))).as("e"))
      .head()
    math.min(r.getLong(0), r.getLong(1))
  }

  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.operators.Tables.t(spark, dir, "events").schema
    // events.parquet is a FILE; FileStreamSource requires a directory
    // basePath, so glob the filename — basePath then resolves to $dir
    spark.readStream.schema(schema).parquet(s"$dir/events*")
  }

  /** Runs `q` to a memory sink and returns the sink table. AvailableNow
   * self-terminates for pure event-time pipelines; `done` (sink-complete
   * predicate) covers processing-time-timeout state machines, which keep
   * scheduling empty batches for pending timeouts and must be stopped by
   * the caller side (OperatorsSpec r8 finding). */
  private def runToSink(
      spark: SparkSession,
      q: DataFrame,
      mode: String,
      done: Option[String => Boolean] = None): DataFrame = {
    val name = s"stream_replay_${runId.incrementAndGet()}"
    // Streaming state partitioning is pinned at query start from
    // spark.sql.shuffle.partitions; scope the replay-sized count to the
    // start+await window and restore the session default after (the replays
    // run serially in Bench/Verify, so nothing else observes the override).
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", replayPartitions)
    try {
      val sq = q.writeStream.outputMode(mode).format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      done match {
        case None =>
          // event-time only: the query stops itself once the files are drained
          if (!sq.awaitTermination(300000L)) { sq.stop(); sys.error(s"$name did not terminate") }
        case Some(pred) =>
          val deadline = System.nanoTime() + 300L * 1000000000L
          // also break if the query died: polling a failed stream to the
          // deadline would turn a fast failure into a 5-minute hang
          while (sq.isActive && !pred(name) && System.nanoTime() < deadline) Thread.sleep(100)
          sq.stop()
          sq.awaitTermination(60000L)
          sq.exception.foreach(e => throw e)
          if (!pred(name)) sys.error(s"$name: sink incomplete at deadline")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table(name)
  }

  /** q101: event-time windowed counts with watermark eviction, run through
   * the micro-batch engine in append mode. */
  def windowedCountsReplay(spark: SparkSession, dir: String): DataFrame = {
    // bounded driver pull: ONE row (the global max timestamp) — needed to
    // apply the strict-inside-watermark cut on both engines identically
    val maxTs = graft.operators.Tables.t(spark, dir, "events")
      .agg(max("ts")).head().getTimestamp(0)
    val sink = runToSink(spark, StreamingOps.windowedCounts(eventsStream(spark, dir)), "append")
    sink
      .where(col("window_start") + expr("INTERVAL 1 HOUR") < lit(maxTs) - expr("INTERVAL 2 HOURS"))
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type")
  }

  /** q103: streaming exact dedup ([[StreamingOps.dedupWithinWatermark]])
   * replayed bounded. events.parquet is one file, so AvailableNow delivers
   * every row in ONE micro-batch; state never evicts mid-stream and the
   * surviving set is exactly the distinct key set. Only the key columns are
   * emitted: which physical row survives per key depends on intra-batch
   * arrival order, which the oracle cannot replay. */
  def dedupReplay(spark: SparkSession, dir: String): DataFrame = {
    val sink = runToSink(
      spark,
      StreamingOps.dedupWithinWatermark(eventsStream(spark, dir), Seq("user_id", "event_type")),
      "append")
    sink.select(col("user_id"), col("event_type")).orderBy("user_id", "event_type")
  }

  /** q104: watermarked stream-stream interval join
   * ([[StreamingOps.intervalJoin]]: each purchase x the same user's error
   * events from the preceding hour) replayed bounded. INNER interval-join
   * matches emit in the micro-batch they arrive in (no watermark
   * finalization wait), so the bounded replay's sink equals the batch
   * join. Timestamps are emitted as epoch micros (exact integers on both
   * engines). */
  def intervalJoinReplay(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val joined = StreamingOps.intervalJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "error"))
    val sink = runToSink(spark, joined, "append")
    sink.select(
      col("p_user").as("user_id"),
      unix_micros(col("p_ts")).as("p_us"),
      round(col("p_value"), 2).as("p_value"),
      unix_micros(col("e_ts")).as("e_us"))
      // p_value as the 4th key: two purchases sharing (user_id, ts) joining
      // the same error tie on the first three keys, leaving row order
      // engine-dependent without it (ADVICE r8)
      .orderBy("user_id", "p_us", "e_us", "p_value")
  }

  /** q106: LEFT OUTER watermarked interval join
   * ([[StreamingOps.intervalJoinLeftOuter]]) replayed bounded. Inner matches
   * emit on arrival exactly as q104's; NULL-extended rows emit only in the
   * watermark-advance batch, when eviction proves no error can still match.
   * WHERE the engine draws the eviction line is condition-derived detail
   * (the join tolerates e_ts up to p_ts, so a purchase expires when the
   * global watermark passes p_ts — modulo boundary strictness and the
   * engine's state-watermark arithmetic), so, as q101 does for windows,
   * BOTH this frame and the oracle keep null-extended rows only for
   * p_ts STRICTLY below wm - 1h: one full join-interval of margin, inside
   * which emission is unambiguous under any boundary convention. Rows the
   * engine emits inside the margin band are filtered here and excluded by
   * the oracle identically. wm is the min-policy final watermark
   * (`spark.sql.streaming.multipleWatermarkPolicy` default):
   * min(max p_ts, max e_ts) - 2h, computed from the bounded table — two
   * 1-row driver pulls, the q101 pattern. Null e_ts maps to epoch-micros
   * -1 (both engines), keeping the 4-key total order well-defined. */
  def intervalJoinLeftOuterReplay(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.operators.Tables.t(spark, dir, "events")
    // exact-micros pull ([[minOfSideMaxUs]]); the margin itself is 1h, so the
    // engine's own ms-precision watermark arithmetic stays far inside it
    val wmUs = minOfSideMaxUs(ev) - 2L * 3600 * 1000 * 1000
    val cutoffUs = wmUs - 3600L * 1000 * 1000
    val s = eventsStream(spark, dir)
    val joined = StreamingOps.intervalJoinLeftOuter(
      s.filter(col("event_type") === "purchase"),
      s.filter(col("event_type") === "error"))
    val sink = runToSink(spark, joined, "append")
    sink.select(
        col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"),
        round(col("p_value"), 2).as("p_value"),
        coalesce(unix_micros(col("e_ts")), lit(-1L)).as("e_us"))
      .filter(col("e_us") >= 0 || col("p_us") < cutoffUs)
      .orderBy("user_id", "p_us", "e_us", "p_value")
  }

  /** q107: FULL OUTER watermarked interval join replayed bounded — q106's
   * discipline applied to BOTH sides. Each side's null rows keep one full
   * join-interval of margin below its own theoretical eviction boundary
   * (purchases evict when wm passes p_ts → keep p_us < wm - 1h, q106's
   * cut; errors evict when wm passes e_ts + 1h → keep e_us < wm - 2h), so
   * the engine's boundary conventions cannot flip the compare; the oracle
   * applies identical cuts. Nulls map to -1 (epoch-micros) / -1.0 (value),
   * keeping the 4-key total order well-defined. */
  def intervalJoinFullOuterReplay(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.operators.Tables.t(spark, dir, "events")
    // exact-micros pull ([[minOfSideMaxUs]]), same reason as the left-outer replay
    val wmUs = minOfSideMaxUs(ev) - 2L * 3600 * 1000 * 1000
    val hourUs = 3600L * 1000 * 1000
    val s = eventsStream(spark, dir)
    val joined = StreamingOps.intervalJoinFullOuter(
      s.filter(col("event_type") === "purchase"),
      s.filter(col("event_type") === "error"))
    val sink = runToSink(spark, joined, "append")
    sink.select(
        coalesce(col("p_user"), col("e_user")).as("user_id"),
        coalesce(unix_micros(col("p_ts")), lit(-1L)).as("p_us"),
        coalesce(round(col("p_value"), 2), lit(-1.0)).as("p_value"),
        coalesce(unix_micros(col("e_ts")), lit(-1L)).as("e_us"))
      .filter(
        (col("p_us") >= 0 && col("e_us") >= 0) ||
          (col("e_us") === -1L && col("p_us") < wmUs - hourUs) ||
          (col("p_us") === -1L && col("e_us") < wmUs - 2L * hourUs))
      .orderBy("user_id", "p_us", "e_us", "p_value")
  }

  /** q108: stream-static enrichment ([[StreamingOps.enrichStatic]]) replayed
   * bounded. Stateless (no watermark, no state store): every purchase emits
   * in the micro-batch it arrives in with its customer dims attached, so
   * the bounded replay equals the batch join row-for-row — no margin cuts
   * needed, the one streaming mode with NO emission-boundary caveat. */
  def enrichStaticReplay(spark: SparkSession, dir: String): DataFrame = {
    val dims = graft.operators.Tables.t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val sink = runToSink(spark, StreamingOps.enrichStatic(eventsStream(spark, dir), dims), "append")
    sink.select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"),
        col("nation"), col("segment"), round(col("value"), 2).as("value"))
      .orderBy("event_id")
  }

  /** q123/q124: the whisper streaming TAIL end-to-end — the one composition
   * that previously had spec/counter coverage but no oracle (VERDICT r15
   * missing #1). `readStream.format("whisper")` over the closed-form
   * multi-file .wsp tree ([[graft.operators.WhisperWorkload.streamTailFixture]],
   * four plain files + one gzipped, two retention tiers each) runs through
   * the REAL micro-batch engine (Trigger.AvailableNow; the engine manages
   * its offset log in the run's checkpoint — explicit checkpoint RESUME
   * across runs is pinned by WhisperSourceSpec's parquet-sink test, which
   * the memory sink refuses by design). The frozen window
   * (`streamStartTimestamp`, `streamNowOverride`] makes the delivered point
   * set closed-form: the DuckDB oracle regenerates it from the fixture's
   * ArchiveSpec constants (the q33/q69 technique) and the sink must roll up
   * to the identical hash. `manifestListed=true` (q124) takes the
   * per-trigger file list from the header manifest instead of the walk —
   * the r15 flagship planning path — and must land on the SAME oracle hash
   * as the walk-listed run (q123): one oracle, both listing modes green.
   * Determinism: stateless append (every point emits in the batch it is
   * read in, no watermark), values/timestamps closed-form, doubles only
   * under round(avg, 4) — q69's discipline. */
  def whisperTailReplay(spark: SparkSession, manifestListed: Boolean): DataFrame = {
    val fx = graft.operators.WhisperWorkload.streamTailFixture()
    var rs = spark.readStream.format("whisper")
      .option("streamStartTimestamp", graft.operators.WhisperWorkload.StreamTailStart)
      .option("streamNowOverride", graft.operators.WhisperWorkload.StreamTailNow)
    if (manifestListed)
      rs = rs.option("headerManifest", fx.manifest).option("manifestListing", "true")
    val sink = runToSink(spark, rs.load(fx.tree), "append")
    sink
      .select(
        regexp_extract(col("file"), "([^/]+)\\.wsp(\\.gz)?$", 1).as("metric"),
        col("archive"),
        unix_timestamp(col("timestamp")).as("ts"),
        col("value"))
      .groupBy("metric", "archive")
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts")).as("ts_min"),
        max(col("ts")).as("ts_max"),
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy("metric", "archive")
  }

  /** q102: per-user mapGroupsWithState session state, run through the
   * micro-batch engine in update mode; final state per user reconstructed
   * from the update log by max(n_events). */
  def sessionizeReplay(spark: SparkSession, dir: String): DataFrame = {
    val totalRows = graft.operators.Tables.t(spark, dir, "events").count()
    val sessionized = StreamingOps.sessionize(spark, eventsStream(spark, dir))
    val sink = runToSink(spark, sessionized, "update", done = Some { name =>
      // complete when every input row is reflected in some user's state
      // (per-user n_events is monotone; the max over updates is the total)
      spark.sql(
        s"SELECT coalesce(sum(n), 0) FROM (SELECT max(n_events) AS n FROM $name GROUP BY user_id)"
      ).head().getLong(0) == totalRows
    })
    sink
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_value"))).as("s"))
      .select(
        col("user_id"),
        col("s.n_events").as("n_events"),
        round(col("s.total_value"), 2).as("total_value"))
      .orderBy("user_id")
  }

  /** q132: streaming MinHash-LSH near-dup flagging
   * ([[StreamingOps.lshBandDedup]]) replayed bounded over the documents
   * table. The sink holds one row per (doc, band) collision against an
   * earlier-arriving owner; the replay folds them per doc — how many of
   * the doc's 4 bands hit an occupied bucket, and the earliest owner it
   * collided with. documents.parquet arrives in one micro-batch, so the
   * per-bucket owner state equals the bucket's global min(doc_id), which
   * the batch-dual oracle reproduces exactly (sorted in-batch processing
   * makes this hold across ANY batch split too). */
  def lshDedupReplay(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.operators.Tables.t(spark, dir, "documents").schema
    val docs = spark.readStream.schema(schema).parquet(s"$dir/documents*")
    val sink = runToSink(
      spark,
      StreamingOps.lshBandDedup(spark, docs.select("doc_id", "text")),
      "append")
    sink
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bands_hit"), min(col("owner")).as("first_owner"))
      .orderBy("doc_id")
  }

  /** q133: streaming curation ([[StreamingOps.streamCuration]]) replayed
   * bounded. The STREAM makes the expensive decisions (quality gate inside
   * the scan stage; near-dup collisions against the per-bucket owner
   * state); the replay subtracts the collision sink from the gated set and
   * decorates survivors with the batch lang-ID — the decoration re-runs
   * deterministic row expressions, so the output is exactly what a
   * deployment's downstream writer would persist per admitted doc. Output
   * mirrors q43's kept-corpus shape; the dedup semantic differs by design
   * (arrival-time BAND-CANDIDATE gate — any bucket collision drops the
   * doc — vs q43's verified-Jaccard pair losers). */
  def streamCurationReplay(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.operators.Tables.t(spark, dir, "documents").schema
    val docs = spark.readStream.schema(schema).parquet(s"$dir/documents*")
    val sink = runToSink(
      spark,
      StreamingOps.streamCuration(spark, docs.select("doc_id", "text")),
      "append")
    val collided = sink.select("doc_id").distinct()
    val quality = graft.operators.TextOps.qualityScore(spark, dir)
      .select("doc_id", "quality_score_k", "n_tokens")
    val lang = graft.operators.TextOps.langId(spark, dir).select("doc_id", "lang_pred")
    quality
      .filter(col("quality_score_k") >= 300 && col("n_tokens") >= 20)
      .join(collided, Seq("doc_id"), "left_anti")
      .join(lang, Seq("doc_id"))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"), col("quality_score_k"))
      .orderBy("doc_id")
  }
}
