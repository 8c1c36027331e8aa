package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Rerun-stability under task re-execution (VERDICT r5 item 3).
 *
 * The pid-dependent queries (q48 decile, q55 sequence pack, q98 pretrain
 * export) pin partition identity with `localCheckpoint` between the
 * per-partition-counts job and the main job, because `repartitionByRange`
 * SAMPLES its boundaries and an unpinned recompute may re-draw them.
 * Speculative execution never engages in local mode (TaskSchedulerImpl
 * guards it with `!isLocal`), so the honest local proof of retry-safety is
 * INJECTED failure: every suite session runs with master `local[4,2]`
 * (task maxFailures = 2 — the plain `local[N]` default of 1 turns any task
 * failure into a job failure), and this spec drives the exact two-pass
 * rank discipline with an upstream stage whose every task throws on
 * attempt 0. Real task re-execution then happens in every job that
 * executes the flaky stage — including the range-boundary sampling job and
 * the checkpoint materialization job — and the output must be
 * bit-identical to the clean pipeline's, run after run.
 */
class RetrySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4,2]")
    .appName("retry-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    try spark.stop()
    finally super.afterAll()
  }

  /** The q48 two-pass rank discipline (RelationalOps.decileHistogram),
   * parameterized by source so a flaky upstream can be spliced in. */
  private def decileOf(src: Dataset[(Long, Double)]): Seq[(Int, Long, Double, Double)] = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val orders = src.toDF("k", "v")
      .repartitionByRange(col("v"), col("k"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts = orders.groupBy("pid").agg(count(lit(1)).as("pc"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val localW = Window.partitionBy("pid").orderBy("v", "k")
    val tq = n / 10
    val tr = n % 10
    val decExpr =
      if (tq == 0L) "cast(rn as int)"
      else s"cast(if(rn <= ${(tq + 1) * tr}, (rn - 1) div ${tq + 1} + 1, " +
        s"$tr + (rn - ${(tq + 1) * tr} - 1) div $tq + 1) as int)"
    val out = orders
      .join(broadcast(offsetsDf), "pid")
      .withColumn("rn", col("offset") + row_number().over(localW))
      .withColumn("decile", expr(decExpr))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("decile")
      .as[(Int, Long, Double, Double)].collect().toSeq
    orders.unpersist(blocking = true) // drop the checkpoint blocks between runs
    out
  }

  test("two-pass rank survives injected task failure + retry, bit-identical, 3 runs") {
    import spark.implicits._
    val base = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as[Long], col("o_totalprice").as[Double])
    val clean = decileOf(base)
    assert(clean.map(_._2).sum == 1500L) // sf0.001 orders row count — the data arrived
    val retries = spark.sparkContext.longAccumulator("retried-tasks")
    val flaky = base.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.attemptNumber() == 0)
        throw new RuntimeException("injected: first attempt always fails")
      retries.add(1) // survives only in the SUCCESSFUL (retry) attempt
      it
    }
    for (run <- 1 to 3) {
      retries.reset()
      val got = decileOf(flaky)
      assert(retries.value > 0, s"run $run: injection never engaged — no task retried")
      assert(got == clean, s"run $run: retried pipeline diverged from clean run")
    }
  }

  test("pid-dependent queries q48/q55/q98 are rerun-deterministic in one session") {
    for (name <- Seq("q48_ntile_decile", "q55_sequence_pack", "q98_pretrain_export")) {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, dir).collect().toSeq
      val b = fn(spark, dir).collect().toSeq
      assert(a == b, s"$name: two runs in one session disagree")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }
}
