package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/**
 * Regime self-calibration (VERDICT r13 #4): [[VectorOps.calibrateRegime]]
 * must select the pinned recall curve from the corpus's OWN measured
 * neighbor structure, without the caller naming it — a near-dup-rich panel
 * (the replicated-nudged law the dense curve was measured on,
 * tools/prof_s12_ann.scala) calibrates "dense"; a scattered panel with no
 * near-dup structure (random high-dim vectors: a query's top-10 spreads
 * across cells, the regime the weak curve was measured on) calibrates
 * "weak". Both fixtures are deterministic (fixed-seed java LCG).
 */
class AnnCalibrateSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ann-calibrate")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    try spark.stop()
    finally super.afterAll()
  }

  private def writeEmbeddings(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("ann-cal").toString
    rows.map { case (id, v) => (id, "x", v) }
      .toDF("vec_id", "label", "embedding")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def base(n: Int, dims: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dims)(rnd.nextGaussian().toFloat)))
  }

  test("calibrateRegime: dense on a near-dup-rich corpus, weak on a scattered one; overrides intact") {
    // DENSE: 10 nudged replicas of a 50-vector base (replica i shifts every
    // component by i*1e-3) — each query's top-10 is dominated by its own
    // cos~1 siblings, which share its cell; the regime the dense curve was
    // measured on (3x density already measured 0.900 at nprobe=4)
    val dense = writeEmbeddings(
      for {
        i <- 0 until 10
        (id, v) <- base(50, dims = 64, seed = 7)
      } yield (id + i.toLong * 1000000L, v.map(_ + i * 1e-3f).toSeq))
    // WEAK: 400 independent random vectors — top-10 neighbors scatter across
    // cells, inverted-list pruning is structurally weak (the sf0.1 synthetic
    // measured 0.538 at nprobe=4 under the same discipline)
    val weak = writeEmbeddings(base(400, dims = 64, seed = 11).map { case (id, v) => (id, v.toSeq) })
    assert(VectorOps.calibrateRegime(spark, dense) == "dense",
      "replicated-nudged corpus must calibrate dense")
    assert(VectorOps.calibrateRegime(spark, weak) == "weak",
      "scattered corpus must calibrate weak")
    // the measured regime drives the nprobe dial end to end: a 0.9 target
    // costs 4 probes on the dense corpus and exhaustive 16 on the weak one
    assert(VectorOps.nprobeForRecall(0.9, VectorOps.calibrateRegime(spark, dense)) == 4)
    assert(VectorOps.nprobeForRecall(0.9, VectorOps.calibrateRegime(spark, weak)) == 16)
    // the self-calibrated search overloads run end to end on both panels
    assert(VectorOps.ivfTopK(spark, dense, targetRecall = 0.9).count() > 0)
    assert(VectorOps.ivfTopK(spark, weak, targetRecall = 0.9).count() > 0)
    // the explicit-regime override remains (the operator who KNOWS wins)
    assert(VectorOps.nprobeForRecall(0.9, "weak") == 16)
    // memo hygiene: invalidation forgets the measured regime with the index
    VectorOps.invalidateIndexCache(dense)
    VectorOps.invalidateIndexCache(weak)
  }
}
