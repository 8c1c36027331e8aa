package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnIndex

/**
 * Pins the EXACTNESS of the two-level IVF assignment
 * ([[AnnIndex.ivfAssignHierarchical]], the path `ivfAssign` takes past its
 * 65,536-centroid driver cap): for every k small enough that the flat
 * [[graft.functions.IvfArgmin]] kernel can also run, the hierarchy must
 * produce the BIT-IDENTICAL bucket per vector — same argmin, same
 * (dist2, centroid_id) tie-break. The triangle-inequality cell pruning is
 * exact by construction (see the IvfSuperProbe scaladoc); this spec is the
 * empirical half of that argument on seeded gaussian data, including exact
 * duplicates (distance ties) and centroid-coincident vectors (zero
 * distances), across square, non-square, tiny and prime k.
 */
class HierarchicalAssignSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4,2]")
    .appName("hier-assign-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    try spark.stop() finally super.afterAll()
  }

  private val dim = 6

  /** Seeded corpus with deliberate degeneracy: every 17th vector duplicates
   * vector (i - 17) exactly (distance ties everywhere), and every 23rd is an
   * exact copy of a would-be centroid row. */
  private def corpus(n: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val base = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
    for (i <- 17 until n by 17) base(i) = base(i - 17).clone()
    (0 until n).map(i => (i.toLong, base(i).toSeq)).toDF("vec_id", "emb")
  }

  private def flatVsHier(df: DataFrame, k: Int, idCol: Option[String]): Unit = {
    val n = df.count()
    val cents = AnnIndex.ivfCentroids(df, "emb", "vec_id", k, n)
    // flat kernel path (k is under the cap here by construction)
    val flat = AnnIndex.ivfAssign(df, "emb", cents)
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hier = AnnIndex.ivfAssignHierarchical(df, "emb", idCol, cents)
      .select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hier.size == flat.size, s"row count: hier ${hier.size} vs flat ${flat.size}")
    val diffs = flat.collect { case (id, b) if hier(id) != b => (id, b, hier(id)) }
    assert(diffs.isEmpty, s"k=$k: ${diffs.size} assignment diffs, first 5: ${diffs.take(5).toSeq}")
  }

  test("hierarchy == flat argmin across k shapes (id-keyed refine)") {
    val df = corpus(600, seed = 42L).cache()
    for (k <- Seq(1, 7, 36, 100, 317)) flatVsHier(df, k, Some("vec_id"))
    df.unpersist()
  }

  test("hierarchy == flat argmin without an id column (groupBy-all refine)") {
    // distinct rows only: the generic path groups by every column, so exact
    // duplicate ROWS legitimately collapse — dedup the corpus first to keep
    // the row-count comparison meaningful
    val df = corpus(400, seed = 7L).dropDuplicates("vec_id").cache()
    for (k <- Seq(12, 53)) flatVsHier(df, k, None)
    df.unpersist()
  }

  test("empty centroid relation fails loudly at plan build") {
    val df = corpus(50, seed = 1L)
    val none = df.filter(col("vec_id") < 0)
      .select(col("vec_id").cast("int").as("centroid_id"), col("emb").as("centroid"))
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.ivfAssign(df, "emb", none)
    }
    assert(ex.getMessage.contains("empty centroid relation"))
  }

  test("temp kernel names do not accumulate in the function registry") {
    val df = corpus(100, seed = 3L)
    val cents = AnnIndex.ivfCentroids(df, "emb", "vec_id", 10, 100L)
    def argminEntries(): Int =
      spark.sessionState.functionRegistry.listFunction()
        .count(f => f.funcName.startsWith("ivf_argmin_") || f.funcName.startsWith("ivf_superprobe_"))
    val before = argminEntries()
    val assigned = AnnIndex.ivfAssign(df, "emb", cents)
    assert(argminEntries() == before, "kernel name leaked into the registry")
    // the plan still executes after the registry entry is dropped
    assert(assigned.count() == 100L)
    val hier = AnnIndex.ivfAssignHierarchical(df, "emb", Some("vec_id"), cents)
    assert(argminEntries() == before, "hierarchical kernel names leaked")
    assert(hier.count() == 100L)
  }

  test("bounded refine == plain refine, bit-identical buckets (r10 early abandon)") {
    // The default refine now early-abandons each candidate distance against
    // the probe's ub2; this flips the knob to the plain l2_sq refine and
    // pins equality — including the corpus's planted exact-duplicate ties,
    // where the abandoned kernel must still compute tied winners exactly.
    val df = corpus(600, seed = 11L).cache()
    val cents = AnnIndex.ivfCentroids(df, "emb", "vec_id", 49, 600L)
    def run(): Map[Long, Int] =
      AnnIndex.ivfAssignHierarchical(df, "emb", Some("vec_id"), cents)
        .select(col("vec_id"), col("bucket")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(AnnIndex.refineEarlyAbandon, "bounded refine must be the default")
    val bounded = run()
    AnnIndex.refineEarlyAbandon = false
    val plain = try run() finally AnnIndex.refineEarlyAbandon = true
    assert(bounded.size == 600 && bounded == plain)
    df.unpersist()
  }

  test("l2_sq_bounded: exact at/below the bound, clamped-but-larger beyond it") {
    graft.functions.VectorFunctions.register(spark)
    val df = spark.range(1).selectExpr(
      "array(1.0d, 2.0d, 3.0d) as a", "array(4.0d, 0.0d, 7.0d) as b") // d2 = 9+4+16 = 29
    val r = df.selectExpr(
      "l2_sq(a, b) as full",
      "l2_sq_bounded(a, b, 29.0d) as atBound",   // never abandons (prefix <= 29)
      "l2_sq_bounded(a, b, 100.0d) as above",
      "l2_sq_bounded(a, b, 10.0d) as clamped",   // abandons after 9+4 = 13 > 10
      "l2_sq_bounded(a, b, 0.0d) as zero",       // abandons after 9
      "l2_sq_bounded(a, array(1.0d, 2.0d), 5.0d) as mismatch").head()
    assert(r.getDouble(0) == 29.0 && r.getDouble(1) == 29.0 && r.getDouble(2) == 29.0)
    assert(r.getDouble(3) == 13.0 && r.getDouble(3) > 10.0)
    assert(r.getDouble(4) == 9.0)
    assert(r.isNullAt(5))
  }
}
