package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface (SURVEY §2.5 gap map: absent from the
 * reference — Whisper is a stored series; streaming ingestion is its
 * unimplemented TODO, `whisper_pandas.ipynb:1382`). These transforms are the
 * streaming duals of the batch operators: the same logical plan works under
 * `readStream`, with watermarks bounding state.
 */
object StreamingOps {

  /** Event-time windowed counts with a watermark — the streaming form of
   * [[graft.operators.RelationalOps.downsample8]]'s grouping. Append-mode
   * safe: state for a window is dropped once the watermark passes it. */
  def windowedCounts(events: DataFrame, window: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total")
      )

  /** Streaming exact dedup on a content key with bounded state:
   * duplicates arriving within the watermark horizon are dropped, and the
   * key's state is freed once the watermark passes its event time — the
   * streaming dual of [[graft.operators.DedupOps.exact]]. Without the
   * watermark variant, state grows with every distinct key ever seen; with
   * it, state is O(keys per horizon), which is what survives an unbounded
   * stream. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String], watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream INTERVAL join: each purchase joins the same
   * user's error events from the preceding hour. Both sides carry
   * watermarks and the join predicate bounds the event-time range in both
   * directions, which is exactly what lets Spark expire buffered rows —
   * state is O(rows per watermark horizon) instead of O(stream), the only
   * join shape that survives an unbounded stream. The streaming dual of
   * [[graft.operators.TimeSeriesOps.rangeBucketJoin]]. */
  def intervalJoin(purchases: DataFrame, errors: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", watermark)
    val e = errors
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    p.join(
      e,
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("e_ts") <= col("p_ts"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join — [[intervalJoin]]'s
   * matches plus one null-extended row per purchase with NO error in its
   * preceding hour. Absence can only be asserted once the watermark proves
   * no matching error can still arrive: the engine holds each unmatched
   * purchase in state and emits its null row when the global watermark
   * passes the last event time that could have matched it (state eviction),
   * which is what makes "no match" a sound claim on an unbounded stream —
   * the batch anti-join formulation has no such guarantee point. Same state
   * bound as the inner form: O(rows per watermark horizon). */
  def intervalJoinLeftOuter(purchases: DataFrame, errors: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", watermark)
    val e = errors
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    p.join(
      e,
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("e_ts") <= col("p_ts"),
      "leftOuter")
  }

  /** FULL OUTER watermarked interval join — [[intervalJoinLeftOuter]] plus
   * null-extended rows for ERRORS no purchase picked up in the hour after
   * them. Each side's absence claim waits on its own eviction point: a
   * purchase can match errors up to its own event time (expires when the
   * watermark passes p_ts), an error can match purchases up to one hour
   * later (expires when the watermark passes e_ts + 1h). */
  def intervalJoinFullOuter(purchases: DataFrame, errors: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", watermark)
    val e = errors
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    p.join(
      e,
      col("p_user") === col("e_user") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("e_ts") <= col("p_ts"),
      "fullOuter")
  }

  /** Stream-STATIC enrichment join — the stateless streaming mode (and the
   * most common production join): each micro-batch's purchases broadcast-
   * hash-join the static dimension table, no watermark, no state store,
   * nothing buffered between triggers. At 100 TB/day this is the shape
   * that survives: the dimension broadcasts once per batch and the stream
   * side never shuffles. */
  def enrichStatic(events: DataFrame, dims: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .join(broadcast(dims), col("user_id") === col("c_custkey"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"), col("value"))

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double, closed: Boolean)

  /** Custom state machine via mapGroupsWithState: per-user running session
   * summary with a processing-time idle timeout — the escape hatch for
   * semantics windowed aggregation can't express (KeyValueGroupedDataset
   * state API). */
  def sessionize(spark: SparkSession, events: DataFrame, idleTimeout: String = "30 minutes"): DataFrame = {
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "event_type", "value")
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            s.copy(closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionSummary(uid, 0L, 0.0, closed = false))
            val batch = evs.toSeq
            val next = prev.copy(
              n_events = prev.n_events + batch.size,
              total_value = prev.total_value + batch.map(_.value).sum
            )
            state.update(next)
            state.setTimeoutDuration(idleTimeout)
            next
          }
      }
      .toDF()
  }

  final case class BandRow(bk: String, doc_id: Long)
  final case class BandCollision(doc_id: Long, bk: String, owner: Long)

  /**
   * Streaming MinHash-LSH near-dup flagging — the streaming dual of the
   * batch q25 pipeline's candidate stage: documents arriving on a stream
   * are checked against every document seen SO FAR via per-band-bucket
   * state. The signature (8 md5-slice min-hashes, banded 4x2 — identical
   * constants to [[graft.operators.DedupOps.minhashPairs]]) is computed
   * STATELESSLY map-side; the only state is one Long per occupied band
   * bucket: the smallest doc_id that ever claimed it. A document that
   * lands in a bucket already owned by a smaller id emits a collision row
   * (doc_id, band key, owner) — "this doc is a near-dup CANDIDATE of the
   * earlier owner" — which is exactly the decision an online ingest
   * pipeline needs at arrival time, without ever joining the stream
   * against the corpus.
   *
   * Determinism: batch members are processed in doc_id order and the
   * owner is the running minimum, so a collision's owner is the bucket's
   * global min(doc_id) regardless of micro-batch boundaries — the batch
   * dual (min per band key) reproduces it exactly.
   *
   * Scale shape: state is O(occupied buckets) Longs — duplication-free
   * corpora occupy at most 4 buckets/doc, and a production deployment
   * bounds it with a state TTL (timeout) the same way
   * [[dedupWithinWatermark]] bounds its key set; the collision output is
   * dup-sized, never corpus-sized.
   */
  def lshBandDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    docs
      .select(col("doc_id"), expr("word_shingles(text, 3)").as("sharr"))
      .filter(size(col("sharr")) >= 1)
      .select(col("doc_id"), expr("minhash8(sharr)").as("h"))
      .select(
        col("doc_id"),
        explode(array(
          concat(lit("0"), col("h")(0), col("h")(1)),
          concat(lit("1"), col("h")(2), col("h")(3)),
          concat(lit("2"), col("h")(4), col("h")(5)),
          concat(lit("3"), col("h")(6), col("h")(7))
        )).as("bk"))
      .select(col("bk"), col("doc_id"))
      .as[BandRow]
      .groupByKey(_.bk)
      .flatMapGroupsWithState[Long, BandCollision](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bk: String, rows: Iterator[BandRow], state: GroupState[Long]) =>
          val ids = rows.map(_.doc_id).toArray.sorted
          var owner = state.getOption.getOrElse(Long.MaxValue)
          val out = Seq.newBuilder[BandCollision]
          ids.foreach { id =>
            if (owner < id) out += BandCollision(id, bk, owner)
            else if (id < owner) owner = id
          }
          if (owner != Long.MaxValue) state.update(owner)
          out.result().iterator
      }
      .toDF()
  }

  /**
   * Streaming curation — the q43 flagship as an ONLINE ingest pipeline:
   * arriving documents pass the quality gate (score >= 300, >= 20 tokens,
   * the batch formula verbatim via
   * [[graft.operators.TextOps.withQualityGateCols]] so the stream's admit
   * decision cannot drift from the batch score), and gated docs flow into
   * [[lshBandDedup]]'s per-bucket owner state, emitting a collision row
   * when they near-dup anything previously ADMITTED. The kept corpus is
   * the gated set minus collision docs.
   *
   * The stateless gates run inside the stream's scan stage (one codegen
   * span, no state, no shuffle); only the gated survivors' band keys reach
   * the state store — on a 100 TB ingest the stateful stage sees the
   * post-gate fraction, not the firehose.
   */
  def streamCuration(spark: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val gated = graft.operators.TextOps.withQualityGateCols(docs)
      .filter(col("quality_score_k") >= 300 && col("n_tokens") >= 20)
      .select("doc_id", "text")
    lshBandDedup(spark, gated)
  }
}
