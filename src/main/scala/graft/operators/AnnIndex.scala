package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Approximate nearest neighbour scale paths over an `array<double>` column.
 * Brute force ([[VectorOps.knnBruteForce]]) is the exact baseline; these two
 * make the 100 TB case tractable by turning all-pairs into bucket-local work:
 *
 *  - random-hyperplane LSH (Charikar '02): k sign-projections -> k-bit bucket
 *    key; cosine-similar vectors collide with probability (1 - theta/pi)^k.
 *    Deterministic: hyperplanes come from a seeded RNG, inlined as literals.
 *  - IVF: coarse quantization against a deterministic centroid sample; search
 *    probes only the nearest `nprobe` inverted lists.
 *
 * Both produce a `bucket` column — the partition/shuffle key. A query then
 * touches one bucket (plus probes) instead of the full corpus.
 */
object AnnIndex {

  /** Deterministic unit-free hyperplanes: nPlanes x dim standard normals. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def arraySql(xs: Array[Double]): String =
    xs.map(x => s"${x}D").mkString("array(", ",", ")")

  /** Add an LSH `bucket` column (bit b set iff emb . plane_b > 0). */
  def lshBucketize(df: DataFrame, embCol: String, planes: Array[Array[Double]]): DataFrame = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(
        expr(s"aggregate(zip_with($embCol, ${arraySql(p)}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") > 0,
        lit(1L << i)
      ).otherwise(lit(0L))
    }
    df.withColumn("bucket", bits.reduce(_ + _))
  }

  /** All bucket ids within Hamming distance `probeBits` of `center` — the
   * multi-probe set, sum of C(nPlanes, d) for d <= probeBits ids. Enumerated
   * driver-side (it depends only on the query, never on data) so the search
   * filter is a literal IN-list that PUSHES DOWN. Which pruning tier carries
   * it depends on the layout: a `partitionBy("bucket")` directory layout and
   * a `bucketBy("bucket")` table prune at the CATALOG level, for any id
   * count (the 100 TB layout — AnnPruneSpec pins the documented 137-id
   * config on it). Parquet ROW-GROUP stats pruning, by contrast, only sees
   * the IN-list verbatim up to
   * `spark.sql.parquet.pushdown.inFilterThreshold` (default 10) ids; above
   * that Spark pushes a min/max range, and because the XOR ball scatters
   * across the id domain the range covers nearly everything — so on a flat
   * parquet index either raise that threshold to cover the probe count or
   * accept scan-with-filter. */
  def probeBuckets(center: Long, nPlanes: Int, probeBits: Int): Seq[Long] = {
    def flips(start: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (start until nPlanes).flatMap(i => flips(i + 1, left - 1).map(m => m | (1L << i)))
    (0 to probeBits).flatMap(d => flips(0, d)).map(_ ^ center)
  }

  /** The query vector's LSH bucket under `planes` (sign of each projection). */
  def queryBucket(queryVec: Array[Double], planes: Array[Array[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zip(queryVec).map { case (a, b) => a * b }.sum
      if (dot > 0) 1L << i else 0L
    }.sum

  /** Top-k by cosine among vectors sharing the query's bucket, widened to
   * buckets within Hamming distance `probeBits` (multi-probe improves
   * recall). The probe set is an explicit IN-list of bucket ids, NOT a
   * `bit_count(bucket ^ q)` predicate over the whole corpus: an arithmetic
   * predicate must evaluate on every row, while the IN-list reaches the
   * scan (PushedFilters / bucket pruning / partition pruning), so the
   * search touches only the probed buckets — the property that makes LSH
   * pay off at 100 TB. Plan pinned by AnnPruneSpec. */
  def lshSearch(
      indexed: DataFrame,
      embCol: String,
      queryVec: Array[Double],
      planes: Array[Array[Double]],
      k: Int,
      probeBits: Int
  ): DataFrame = {
    val qBucket = queryBucket(queryVec, planes)
    val qSql = arraySql(queryVec)
    indexed
      .filter(col("bucket").isin(probeBuckets(qBucket, planes.length, probeBits): _*))
      .withColumn(
        "cos",
        expr(
          s"""aggregate(zip_with($embCol, $qSql, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
             | / (sqrt(aggregate($embCol, 0D, (acc, x) -> acc + x * x))
             |    * sqrt(aggregate($qSql, 0D, (acc, x) -> acc + x * x)))""".stripMargin
        )
      )
      .orderBy(col("cos").desc)
      .limit(k)
  }

  /** IVF coarse centroids: a deterministic systematic sample of the corpus
   * (every `step`-th vector by id) — sampling beats k-means iterations when
   * the assignment only needs to be balanced, not optimal, and it keeps the
   * index build a single pass. */
  def ivfCentroids(df: DataFrame, embCol: String, idCol: String, nCentroids: Int): DataFrame =
    ivfCentroids(df, embCol, idCol, nCentroids, df.count())

  /** Action-free variant: the caller supplies the corpus size (knowable from
   * table metadata, a prior pass, or a memoized build — see
   * [[VectorOps.ivfTopK]]), so building the centroid PLAN launches no Spark
   * job. `step` is then a literal and the id filter pushes down to the scan. */
  def ivfCentroids(df: DataFrame, embCol: String, idCol: String, nCentroids: Int, corpusN: Long): DataFrame = {
    val step = math.max(corpusN / nCentroids, 1L)
    df.filter((col(idCol) % step === 0) && (col(idCol) / step < nCentroids))
      .select((col(idCol) / step).cast("int").as("centroid_id"), col(embCol).as("centroid"))
  }

  /** IVF search: probe the `nprobe` centroids nearest the query (driver-side
   * over the tiny centroid table), then exact cosine top-k within those
   * inverted lists only — the corpus fraction touched is ~nprobe/nCentroids. */
  def ivfSearch(
      assigned: DataFrame,
      centroids: DataFrame,
      embCol: String,
      queryVec: Array[Double],
      k: Int,
      nprobe: Int
  ): DataFrame = {
    val cents = centroids.collect().map { r =>
      val id = r.getAs[Int]("centroid_id")
      val c = r.getAs[scala.collection.Seq[Double]]("centroid").toArray
      val d2 = c.zip(queryVec).map { case (a, b) => (a - b) * (a - b) }.sum
      (id, d2)
    }
    val probeIds = cents.sortBy(_._2).take(nprobe).map(_._1).toSeq
    val qSql = arraySql(queryVec)
    assigned
      .filter(col("bucket").isin(probeIds: _*))
      .withColumn(
        "cos",
        expr(
          s"""aggregate(zip_with($embCol, $qSql, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
             | / (sqrt(aggregate($embCol, 0D, (acc, x) -> acc + x * x))
             |    * sqrt(aggregate($qSql, 0D, (acc, x) -> acc + x * x)))""".stripMargin
        )
      )
      .orderBy(col("cos").desc)
      .limit(k)
  }

  /**
   * Lloyd refinement of the IVF centroids: `iters` rounds of
   * assign-to-nearest then recompute-means. Each round is two jobs:
   * [[ivfAssign]] (map-only arg-min kernel, no shuffle) and a
   * mean recompute via posexplode -> groupBy (bucket, pos) — one shuffle of
   * dim x n partial-aggregated rows, then a tiny per-bucket regroup to
   * re-assemble `centroid` arrays. K-means' monotonicity guarantees the
   * mean within-cluster distortion never increases, so a couple of rounds
   * tighten the systematic-sample seed ([[ivfCentroids]]) without giving up
   * determinism (no random restarts; ties broken by centroid_id). Empty
   * clusters keep their previous centroid (left join + coalesce) so
   * `nCentroids` is stable across rounds.
   */
  def ivfRefine(df: DataFrame, embCol: String, idCol: String, centroids: DataFrame, iters: Int): DataFrame = {
    var cents = centroids
    for (_ <- 1 to iters) {
      val means = ivfAssign(df.select(col(idCol), col(embCol)), embCol, cents)
        .select(col("bucket").as("centroid_id"), posexplode(col(embCol)).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(avg("x").as("m"))
        .groupBy("centroid_id")
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)").as("mean_c"))
      cents = cents
        .join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"), coalesce(col("mean_c"), col("centroid")).as("centroid"))
    }
    cents
  }

  /** Assign each vector to its nearest centroid (broadcast centroids; one
   * map-side pass, no shuffle until the consumer groups by bucket). */
  /** Centroid counts up to this ride as an expression field (k*d doubles of
   * driver memory, ~32 MB at the cap with d=64); beyond it assignment
   * switches to the EXACT two-level hierarchy ([[ivfAssignHierarchical]]):
   * assign to ~sqrt(k) super-centroids with triangle-inequality cell
   * pruning, arg-min within the probed cells — both legs driver-bounded
   * at sqrt(k), so the scheme covers k up to this cap SQUARED (~4.3e9
   * centroids; under the SemDeDup k-proportional-to-n law the flat kernel's
   * bound is crossed at ~8M vectors, well below 100 TB scale). */
  final val ArgminKernelMaxCentroids = 65536

  private val argminNameId = new java.util.concurrent.atomic.AtomicLong()

  /** Bind a one-off kernel name, build the plan, then DROP the registry
   * entry (ADVICE r8: `expr()` resolves eagerly inside the build, so the
   * plan holds the expression directly; leaving the name registered would
   * strongly pin each call's centroid matrix — up to ~32 MB — in the
   * session registry for the session's lifetime). */
  private def withTempKernel(
      spark: SparkSession,
      prefix: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)(
      use: String => DataFrame): DataFrame = {
    val name = s"${prefix}_${argminNameId.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    try use(name)
    finally spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))
  }

  def ivfAssign(df: DataFrame, embCol: String, centroids: DataFrame): DataFrame =
    ivfAssignImpl(df, embCol, None, centroids)

  /** [[ivfAssign]] with a UNIQUE row-id column: past the kernel cap the
   * hierarchical refine can then aggregate NARROW (id, centroid_id, dist2)
   * rows and join the assignment back, instead of dragging every df column
   * (embedding payload included) through the arg-min sort. Callers with a
   * key column should prefer this overload. */
  def ivfAssign(df: DataFrame, embCol: String, idCol: String, centroids: DataFrame): DataFrame =
    ivfAssignImpl(df, embCol, Some(idCol), centroids)

  private def ivfAssignImpl(
      df: DataFrame, embCol: String, idCol: Option[String], centroids: DataFrame): DataFrame = {
    val spark = df.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val cents = centroids.limit(ArgminKernelMaxCentroids + 1).collect()
    // A silently-empty centroid relation (sparse/1-based id spaces can
    // starve the systematic sample) would build a kernel whose every
    // evaluation throws ArrayIndexOutOfBounds mid-task; fail at plan build
    // with the actual cause instead (ADVICE r8).
    require(cents.nonEmpty,
      "ivfAssign: empty centroid relation — the systematic sample found no rows " +
        "(sparse or non-zero-based id space?); densify ids or supply explicit centroids")
    if (cents.length <= ArgminKernelMaxCentroids) {
      // Map-only argmin: the centroid matrix rides as an expression field
      // (the PqAdcDist binding pattern) and assignment is ONE codegen pass
      // over the corpus — no join, no shuffle, no aggregate. The previous
      // crossJoin + min_by shape was the r8 100x vector sweep's quadratic
      // bottleneck: min_by's struct buffer forces SortAggregate, which
      // SORTS all n*k crossJoin rows with the embedding payload attached
      // (52 s at 60k vectors x 480 centroids; k grows with n under the
      // SemDeDup law). Ties break to the lowest centroid id in both
      // shapes — outputs are bit-identical.
      val ordered = cents.map { r =>
        (r.getAs[Int]("centroid_id"), r.getAs[scala.collection.Seq[Double]]("centroid").toArray)
      }.sortBy(_._1)
      withTempKernel(spark, "ivf_argmin",
        exprs => graft.functions.IvfArgmin(exprs.head, ordered.map(_._2), ordered.map(_._1))) {
        // expr() resolves the registry entry NOW, so the matrix is baked
        // into this plan; the name is dropped on return (ADVICE r8) and
        // later registrations cannot touch it
        name => df.withColumn("bucket", expr(s"$name($embCol)"))
      }
    } else ivfAssignHierarchical(df, embCol, idCol, centroids)
  }

  /**
   * EXACT two-level assignment for k past the driver-side kernel cap —
   * bit-identical bucket output to the flat [[graft.functions.IvfArgmin]]
   * (HierarchicalAssignSpec pins the equality), with every driver pull
   * bounded at g = ceil(sqrt(k)) rows:
   *
   *  1. supers = every ceil(k/g)-th centroid by id (a systematic subsample
   *     of the centroid relation — each super is itself a fine centroid).
   *  2. Fine centroids get their cell by the FLAT kernel over the g supers
   *     (k-row job); per-cell member radii aggregate from the same relation
   *     (g-row collect).
   *  3. Every vector emits its candidate CELLS through the codegen
   *     [[graft.functions.IvfSuperProbe]] bound (triangle inequality:
   *     `d(v,s) − r_s > min_s d(v,s)` proves cell s cannot hold the global
   *     winner — see the kernel scaladoc; the eps margin only ever ADDS
   *     cells, so pruning never costs exactness), then equi-joins the fine
   *     centroids of just those cells — n * (k/g) * probedCells candidate
   *     rows instead of the crossJoin's n * k, and the join is an equi-join
   *     AQE can skew-split, not a broadcast of an over-cap centroid table.
   *  4. Per-vector arg-min with the (dist2, centroid_id) tie-break —
   *     identical order to the flat kernel's strict-< first-minimum scan,
   *     and `l2_sq` accumulates left-to-right exactly like the kernel, so
   *     the chosen ids are bit-identical.
   *
   * With `idCol` set the arg-min aggregates narrow (id, cid, dist2) rows
   * (partial min_by collapses each task's candidates map-side) and the
   * bucket joins back on the id; without it the aggregate groups by every
   * df column, dragging the embedding payload through the sort — correct,
   * but prefer the id overload at scale.
   */
  private[graft] def ivfAssignHierarchical(
      df: DataFrame, embCol: String, idCol: Option[String], centroids: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val k = centroids.count()
    val g = math.min(math.ceil(math.sqrt(k.toDouble)).toLong, ArgminKernelMaxCentroids.toLong)
    val stride = (k + g - 1) / g
    val supersDF = centroids.filter(col("centroid_id") % stride === 0)
    // leg 1: cell per fine centroid, via the flat kernel over <= g supers
    // (recursion depth is 1: supers are under the cap by construction)
    val cellOf = ivfAssignImpl(centroids, "centroid", Some("centroid_id"), supersDF)
      .select(col("centroid_id"), col("centroid"), col("bucket").as("cell"))
    // per-cell member radius r_s = max d(member, super); g-row collect
    val radiusRows = cellOf
      .join(broadcast(supersDF.select(col("centroid_id").as("cell"), col("centroid").as("scent"))), Seq("cell"))
      .select(col("cell"), expr("sqrt(l2_sq(centroid, scent))").as("r"))
      .groupBy("cell").agg(max("r").as("r"))
      .collect().map(r => r.getAs[Int]("cell") -> r.getAs[Double]("r")).toMap
    val supers = supersDF.collect().map { r =>
      (r.getAs[Int]("centroid_id"), r.getAs[scala.collection.Seq[Double]]("centroid").toArray)
    }.sortBy(_._1)
    val radii = supers.map { case (sid, _) => radiusRows.getOrElse(sid, 0.0) }
    // leg 2: candidate cells per vector (codegen bound), explode + equi-join
    val probed = withTempKernel(spark, "ivf_superprobe",
      exprs => graft.functions.IvfSuperProbe(
        exprs.head, supers.map(_._2), supers.map(_._1), radii, 1e-9)) { name =>
      df.withColumn("cell", explode(expr(s"$name($embCol)")))
    }
    val cands = probed.join(cellOf, Seq("cell"))
      .withColumn("dist2", expr(s"l2_sq($embCol, centroid)"))
    val tieMin = min_by(col("centroid_id"), struct(col("dist2"), col("centroid_id"))).as("bucket")
    idCol match {
      case Some(id) =>
        val best = cands.select(col(id), col("centroid_id"), col("dist2"))
          .groupBy(id).agg(tieMin)
        df.join(best, Seq(id))
      case None =>
        cands.groupBy(df.columns.map(col): _*).agg(tieMin)
    }
  }
}
