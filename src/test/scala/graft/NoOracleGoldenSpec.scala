package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Golden expectations for the queries with no DuckDB oracle (xxhash64,
 * rolling hashes, and the .wsp format have no DuckDB analogue, so the
 * driver's correctness gate records only a Spark row count for them, with
 * nothing to compare it to). These pin that row count — plus the structural
 * invariants each query's semantics promise — against golden values at
 * sf0.001, so a regression in a no-oracle path fails a spec instead of
 * passing silently.
 */
class NoOracleGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4,2]")
    .appName("no-oracle-golden-spec")
    .withExtensions(new GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    try spark.stop()
    finally super.afterAll()
  }

  test("q29 simhash: golden count, ordered distinct pairs, hamming bound") {
    val rows = SparkEntry.queries("q29_dedup_simhash")(spark, dir).collect()
    assert(rows.length == 98)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 6))
  }

  test("q33 whisper pipeline: golden count, pruned archive only, distinct buckets") {
    val rows = SparkEntry.queries("q33_whisper_pipeline")(spark, dir).collect()
    assert(rows.length == 279)
    assert(rows.map(_.getInt(0)).toSet == Set(1)) // the query prunes to archive 1
    val buckets = rows.map(_.getString(1))
    assert(buckets.distinct.length == buckets.length)
    assert(rows.forall(_.getLong(3) > 0)) // n_points
  }

  test("q44 winnow: golden count, ordered pairs, shared-fingerprint floor") {
    val rows = SparkEntry.queries("q44_dedup_winnow")(spark, dir).collect()
    assert(rows.length == 35)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getLong(2) >= 10)) // minShared default
  }

  test("q69 ref-scale whisper scan: golden per-archive filled-point counts") {
    val rows = SparkEntry.queries("q69_whisper_ref_scale")(spark, dir).collect()
    val counts = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the reference example file's per-archive filled counts (BASELINE.md)
    assert(counts == Map(0 -> 1555200L, 1 -> 2331015L, 2 -> 38855L))
  }
}
