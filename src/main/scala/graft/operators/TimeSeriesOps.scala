package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Time-series operators. The reference stores multi-resolution downsampled
 * series but never executes the aggregation enum (`whisper_pandas.py:33-42`
 * decodes it as metadata only); here the 8 Graphite methods are executable
 * downsampling, plus the resample/gap-fill and as-of-join shapes every
 * time-series workload needs.
 *
 * Everything is groupBy/window composition — one shuffle on the grouping
 * key, partial aggregation map-side, no custom physical operators needed.
 */
object TimeSeriesOps {
  import Tables.t

  /** The 8 Whisper aggregation methods as Columns over a value column.
   * absmax/absmin keep Graphite's signed semantics (`graphite whisper.py`:
   * the value with the largest/smallest magnitude, sign preserved) with a
   * deterministic tie-break toward the larger signed value, via lexicographic
   * struct ordering in max_by/min_by — composition of built-ins, no UDAF. */
  def aggMethod(method: String, v: Column): Column = method match {
    case "average"  => avg(v)
    case "sum"      => sum(v)
    case "last"     => max_by(v, col("__ts_order"))
    case "max"      => max(v)
    case "min"      => min(v)
    case "avg_zero" => avg(coalesce(v, lit(0.0)))
    case "absmax"   => max_by(v, struct(abs(v), v))
    case "absmin"   => min_by(v, struct(abs(v), v.unary_-))
    case other      => throw new IllegalArgumentException(s"unknown aggregation method: $other")
  }

  /**
   * Downsample a (ts, value) frame into fixed buckets with one of the 8
   * methods — the operation Graphite performs at write time between archive
   * tiers. Works over any frame including `spark.read.format("whisper")`
   * output. `keys` are carried grouping columns (e.g. file/archive).
   */
  def downsample(df: DataFrame, bucket: String, method: String, keys: Seq[String] = Seq.empty): DataFrame = {
    val grouped = df
      .withColumn("__ts_order", col("timestamp"))
      .groupBy((keys.map(col) :+ window(col("timestamp"), bucket).as("bucket")): _*)
    val value = method match {
      case "last" => max_by(col("value"), col("__ts_order")).as("value")
      case _      => aggMethod(method, col("value")).as("value")
    }
    grouped
      .agg(value, count(lit(1)).as("n_points"))
      .select((keys.map(col) :+ col("bucket.start").as("bucket_start") :+ col("value") :+ col("n_points")): _*)
  }

  /** Hourly resample of events with a dense calendar spine (gap hours kept,
   * n = 0, avg = -1 sentinel). Spine bounds are fixed so the result is a
   * deterministic calendar grid regardless of data scale. */
  def resampleGapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val types = e.select(col("event_type")).distinct()
    val spine = spark.range(1).select(explode(expr(
      "sequence(to_timestamp('2024-01-01 00:00:00'), to_timestamp('2024-01-30 23:00:00'), interval 1 hour)"
    )).as("h")).crossJoin(broadcast(types))
    val agg = e.groupBy(
      date_trunc("hour", col("ts")).as("h"),
      col("event_type")
    ).agg(count(lit(1)).as("n0"), round(sum(col("value")) * 100.0, 0).cast("bigint").as("sc0"))
    spine.join(agg, Seq("h", "event_type"), "left")
      .select(
        date_format(col("h"), "yyyy-MM-dd HH:00").as("hour_bucket"),
        col("event_type"),
        coalesce(col("n0"), lit(0L)).as("n"),
        // exact integer cents (engine-stable); gap hours -> -1 sentinel
        coalesce(col("sc0"), lit(-1L)).as("sum_cents")
      )
      .orderBy("hour_bucket", "event_type")
  }

  /**
   * Hourly resample with LINEAR INTERPOLATION across gap hours (pandas
   * `interpolate(method="time")` analogue): real hours keep their exact
   * integer-cents sum; gap hours get
   * `prev + (next - prev) * (t - t_prev) / (t_next - t_prev)` floored,
   * carried by last/first-ignoreNulls windows over the calendar spine.
   * Leading/trailing gaps (no neighbor on one side) stay at the -1 sentinel.
   * All interpolation inputs are exact integers, so the scalar math is
   * bit-identical across engines — fully oracle-checkable.
   */
  def interpolateHourly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = resampleGapFill(spark, dir)
      .withColumn("idx", (unix_timestamp(to_timestamp(col("hour_bucket"), "yyyy-MM-dd HH:mm")) / 3600).cast("long"))
      .withColumn("real", when(col("n") > 0, struct(col("idx").as("i"), col("sum_cents").as("v"))))
    val w = Window.partitionBy("event_type").orderBy("idx")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    base
      .withColumn("p", last(col("real"), ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(col("real"), ignoreNulls = true).over(wNext))
      .withColumn(
        "filled_cents",
        when(col("n") > 0, col("sum_cents"))
          .when(
            col("p").isNotNull && col("nx").isNotNull,
            floor(
              col("p.v") + (col("nx.v") - col("p.v")) * (col("idx") - col("p.i"))
                / (col("nx.i") - col("p.i"))
            ).cast("long")
          )
          .otherwise(lit(-1L))
      )
      .select(col("hour_bucket"), col("event_type"), col("n"), col("filled_cents"))
      .orderBy("hour_bucket", "event_type")
  }

  /**
   * As-of join: for each left row, the latest right row with
   * right.order <= left.order within the same key — THE time-series join
   * (Spark has no built-in; DuckDB/kdb/pandas merge_asof do).
   *
   * Implementation is the union trick: tag both sides, sort per key by
   * (order, side), propagate the last seen right values with
   * `last(..., ignoreNulls)` over an unbounded-preceding window, keep left
   * rows. ONE shuffle on the key (window sort), no range join, no broadcast
   * of either side — scales to arbitrarily large both sides.
   *
   * `right` columns in `payload` are emitted with nulls when no match.
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      order: String,
      payload: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lTagged = left.withColumn("__side", lit(1))
      .withColumns(payload.map(p => s"__r_$p" -> lit(null).cast(right.schema(p).dataType)).toMap)
    val rTagged = right.select((Seq(col(key), col(order)) ++ payload.map(p => col(p).as(s"__r_$p"))): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // side 0 (right) sorts before side 1 (left) at equal order values, so a
    // right row at exactly left.order is visible to that left row.
    val w = Window.partitionBy(key).orderBy(col(order), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"__asof_$p", last(col(s"__r_$p"), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("__side") === 1)
    val cleaned = payload.foldLeft(out) { (df, p) =>
      df.withColumn(s"asof_$p", col(s"__asof_$p")).drop(s"__r_$p", s"__asof_$p")
    }
    cleaned.drop("__side")
  }

  /** As-of join query: each error event picks up the user's most recent
   * prior-or-simultaneous purchase value (null-free output: -1 sentinel).
   * Ordering key is exact integer microseconds so Spark (us timestamps) and
   * DuckDB (ns timestamps) compare identically. */
  def asofErrorPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").withColumn("us", unix_micros(col("ts")))
    val errors = e.filter(col("event_type") === "error").select(col("event_id"), col("user_id"), col("us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("value"))
    asofJoin(errors, purchases, key = "user_id", order = "us", payload = Seq("value"))
      .select(
        col("event_id"),
        col("user_id"),
        coalesce(col("asof_value"), lit(-1.0)).as("last_purchase_value")
      )
      .orderBy("event_id")
  }

  /**
   * Exponentially-weighted moving average over a trailing 20-event window,
   * per event type — the decay-weighted rolling statistic that plain
   * window aggregates can't express (the recurrence needs per-row
   * weights). Shape: collect the frame into an array (bounded: 20
   * elements), weight each element with `0.5^age` via an indexed
   * transform, fold — all inside one window shuffle.
   *
   * Decay 0.5 is chosen deliberately: `0.5^k` and `x * 0.5^k` are EXACT
   * in binary floating point (exponent shifts), so the only inexactness
   * is the final 20-term fold, identical left-to-right in both engines —
   * a `pow(0.9, k)` weighting would hang parity on last-ulp `pow`
   * agreement across libm implementations. Output quantized to cents.
   */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(-19, Window.currentRow)
    t(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("vals", collect_list("value").over(w))
      .select(
        col("event_id"), col("event_type"),
        expr(
          """cast(round(aggregate(
            |  transform(vals, (x, i) -> x * pow(0.5D, size(vals) - 1 - i)),
            |  0D, (acc, x) -> acc + x) * 100) as bigint)""".stripMargin
        ).as("ewma_cents")
      )
      .orderBy("event_id")
  }

  /**
   * Time-range join via bucketing: for every purchase, count same-user
   * error events within +-300 s. Spark plans a raw range predicate as a
   * broadcast-nested-loop join — O(n*m) comparisons and a broadcast of a
   * whole side — so instead both sides are bucketed to the window width and
   * the probe side explodes to its 3 adjacent buckets: the join becomes a
   * hash equi-join on (user_id, bucket) with the range check as a residual,
   * and each qualifying pair meets in EXACTLY one bucket (the build row's
   * own), so no post-join dedup. 3x probe amplification buys
   * O(matches) instead of O(n*m) — the standard interval-join shape at
   * 100 TB, and the same trick `asofJoin`'s scaladoc describes for
   * bounded-lookback as-of.
   */
  def rangeBucketJoin(spark: SparkSession, dir: String, windowSec: Long = 300L): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("pb", explode(array(
        (col("sec") / windowSec).cast("long") - 1,
        (col("sec") / windowSec).cast("long"),
        (col("sec") / windowSec).cast("long") + 1)))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
        col("sec").as("e_sec"), (col("sec") / windowSec).cast("long").as("eb"))
    purchases
      .join(errors,
        col("user_id") === col("e_user") && col("pb") === col("eb") &&
          abs(col("sec") - col("e_sec")) <= windowSec,
        "left")
      .groupBy("event_id")
      .agg(count(col("e_id")).as("n_nearby"))
      .orderBy("event_id")
  }

  /** Batch sessionization: gap-based session assignment (new session when
   * >30 min since the user's previous event), then per-session stats. The
   * classic lag -> boundary-flag -> running-sum pattern: both windows share
   * the same (user_id) partitioning and (sec, event_id) ordering, so Spark
   * plans ONE shuffle and one sort for the whole chain. The streaming
   * equivalent (mapGroupsWithState) lives in [[graft.streaming.StreamingOps]];
   * this is its batch/backfill twin. */
  def sessionizeBatch(spark: SparkSession, dir: String, gapSec: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    t(spark, dir, "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .withColumn("prev", lag("sec", 1).over(w))
      .withColumn(
        "is_new",
        when(col("prev").isNull || col("sec") - col("prev") > gapSec, 1).otherwise(0)
      )
      .withColumn("session_idx", sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("sec")).as("start_sec"),
        max(col("sec")).as("end_sec")
      )
      .orderBy("user_id", "session_idx")
  }

  /**
   * Sliding (hopping) window aggregation: 1-hour windows every 30 minutes
   * via Spark's native `window()` — each event lands in exactly
   * `size/slide` = 2 windows (the generator expands them map-side, before
   * the aggregation shuffle on the window key, so partial aggregation still
   * collapses each task's output to one row per (window, type)). The value
   * sum is quantized to integer cents BEFORE summing — integer addition is
   * order-independent, so the result is identical at any parallelism and in
   * any engine, where a float sum depends on shuffle layout
   * ([[graft.operators.VectorOps.labelCentroids]] states the same rule).
   * Epoch-aligned buckets: Spark's `window()` origin and DuckDB's
   * `time_bucket` agree on 1970-01-01 UTC.
   */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_cents")
      )
      // epoch seconds, not raw timestamps: engines disagree on timestamp
      // unit metadata (ns vs us) even when values match, exactly as q04
      .select(unix_timestamp(col("window.start")).as("ws_sec"),
        col("event_type"), col("n"), col("sum_cents"))
      .orderBy("ws_sec", "event_type")

  /**
   * Conversion funnel (signup -> view -> purchase, each step within 24 h of
   * the previous): the event-sequence query behind every activation
   * dashboard. Each stage is a min-timestamp aggregate of the event stream
   * joined against the previous stage's per-user frontier; all three joins
   * and all three aggregates key on `user_id`, so the chain co-partitions on
   * one shuffle key end-to-end and the stage frontiers stay bounded by the
   * user count (not the event count) — the property that holds at 100 TB,
   * where events are huge but per-user frontiers are one row each. NULL
   * stage timestamps mean the user never reached that stage (LEFT joins
   * preserve the full population for conversion-rate math downstream).
   */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = e.filter(col("event_type") === "view").join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = e.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), unix_timestamp(col("t1")).as("t1_sec"),
        unix_timestamp(col("t2")).as("t2_sec"), unix_timestamp(col("t3")).as("t3_sec"))
      .orderBy("user_id")
  }

  /**
   * Retention cohort matrix: users cohorted by first-purchase week, counted
   * active in each subsequent week — the classic triangle every growth team
   * reads. Week buckets come from `date_trunc('week', ...)` (Monday-based in
   * both engines); week offsets are exact integer day arithmetic. Shape:
   * one distinct on (user, week) — partial-aggregated map-side, output
   * bounded by users x weeks — then a user-keyed join against the per-user
   * cohort frontier (bounded by user count) and a tiny rollup. The raw
   * event table is read once and never carries its full width past the
   * first projection.
   */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val cohorts = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(date_trunc("week", min("ts")).cast("date").as("cohort"))
    val active = e.select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk")).distinct()
    cohorts.join(active, "user_id")
      .filter(col("wk") >= col("cohort"))
      .withColumn("week_no", expr("cast(datediff(wk, cohort) div 7 as bigint)"))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"), col("week_no"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort", "week_no")
  }
}
