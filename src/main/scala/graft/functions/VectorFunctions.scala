package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Hot-path numeric kernels as native Catalyst expressions with whole-stage
 * codegen. Spark's higher-order functions (`aggregate`, `zip_with`) are
 * interpreted per element — fine for occasional use, 10x too slow when a
 * pair join evaluates millions of 64-dim dot products. These generate tight
 * Java loops instead (SURVEY §4 preference tier (b): custom `Expression`
 * before custom physical operators).
 *
 * `dot_d` accumulates left-to-right in double, exactly like the
 * `aggregate(zip_with(...))` formulation it replaces — results are
 * bit-identical, so DuckDB oracle parity is preserved.
 */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"

  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_d needs two array<double> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullable: Boolean = true

  /** NULL on dimension mismatch — a truncated/corrupt embedding must surface
   * as missing data, not as a plausible-looking partial dot product. */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct = copy(l, r)
}

/**
 * `l2_sq(array<double>, array<double>)` — squared L2 distance, accumulated
 * left-to-right in double, bit-identical to the
 * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0D, (acc,x) -> acc+x)`
 * HOF it replaces (same element order, same double adds). The HOF pays an
 * interpreted lambda + an intermediate array per evaluation; in the IVF
 * assignment that is n*k evaluations (k grows with the corpus under the
 * SemDeDup k-proportional-to-n law), which made assignment the quadratic
 * bottleneck of the 100x vector sweep. This is the same tight-loop shape
 * as [[DotProduct]].
 */
case class L2Squared(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_sq needs two array<double> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Squared = copy(l, r)
}

/**
 * `l2_sq_bounded(array<double>, array<double>, bound)` — [[L2Squared]] with
 * the flat kernel's early abandon folded into a JOIN-side refine (VERDICT r9
 * #7): once the running prefix sum EXCEEDS `bound`, the suffix is skipped
 * and the partial sum returned.
 *
 * Exactness under an argmin consumer with `bound >= winner_d2` (the
 * hierarchical assignment passes `ub2 = min_s d(v,s)^2`, and the nearest
 * super IS a fine centroid, so the true winner's d2 <= ub2):
 *  - a candidate with true d2 <= bound NEVER abandons (every prefix <= the
 *    full sum <= bound, and abandonment requires prefix > bound), so its
 *    value — including any tie with the winner — is bit-identical to
 *    [[L2Squared]]'s left-to-right accumulation;
 *  - an abandoned candidate returns a prefix > bound >= winner_d2, so it
 *    still loses the (dist2, id) argmin strictly.
 * The returned VALUE for abandoned candidates is not the true distance —
 * this kernel is for argmin/threshold pruning, not for reporting distances.
 */
case class L2SquaredBounded(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq_bounded"

  override def checkInputDataTypes() = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (arraysOk && third.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2_sq_bounded needs (array<double>, array<double>, double), got " +
        s"${Seq(first, second, third).map(_.dataType.catalogString).mkString(", ")}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any, b: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val c = r.asInstanceOf[ArrayData]
    if (a.numElements() != c.numElements()) return null
    val bound = b.asInstanceOf[Double]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n && acc <= bound) {
      val d = a.getDouble(i) - c.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $c.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  // early abandon: prefix > bound can never win an argmin whose
         |  // winner is <= bound (see scaladoc); loop guard keeps ties exact
         |  for (int $i = 0; $i < $a.numElements() && $acc <= $b; $i++) {
         |    double $d = $a.getDouble($i) - $c.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): L2SquaredBounded = copy(f, s, t)
}

/**
 * `ivf_argmin(array<double>)` — nearest-centroid id over a centroid matrix
 * riding as an expression field (the [[PqAdcDist]] binding pattern: the
 * builder closure captures the driver-pulled matrix). Distance is the same
 * left-to-right double accumulation as [[L2Squared]]; ties break to the
 * LOWEST centroid id (strict `<` keeps the first minimum), bit-identical
 * to `min_by(centroid_id, struct(dist2, centroid_id))` over the l2_sq
 * crossJoin it replaces.
 *
 * Why an expression and not a join+aggregate: `min_by` is a declarative
 * aggregate with a struct buffer, which no hash aggregate accepts — the
 * plan degrades to SortAggregate and SORTS all n*k crossJoin rows (each
 * dragging the embedding payload). Measured in the r8 100x vector sweep:
 * 52 s at 60k vectors x 480 centroids, and k grows with n under the
 * SemDeDup law, so that shape is quadratic with a sort constant. This
 * kernel is one map-side pass, no join, no shuffle, no aggregate:
 * n * k * d flops in generated code.
 *
 * `centroidIds(j)` maps matrix row j back to its centroid id (rows must be
 * sorted by id so the tie-break is the id order). Bounded use only: the
 * matrix is driver memory (k * d doubles) — callers cap k (65,536 in
 * [[graft.operators.AnnIndex.ivfAssign]]) and fall back to the
 * crossJoin shape beyond it; past ~10^6 centroids the real answer is a
 * coarse hierarchy, documented there.
 */
case class IvfArgmin(
    child: Expression,
    centroids: Array[Array[Double]],
    centroidIds: Array[Int]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_argmin"

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ivf_argmin needs array<double>, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var best = 0
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var acc = 0.0
      var i = 0
      val lim = math.min(n, c.length)
      var ok = n == c.length
      // early abandon: a prefix sum already >= bestD can never win the
      // strict-< scan (the final acc only grows), so skipping the suffix
      // changes nothing — not the winner, not the first-minimum tie-break
      while (ok && i < lim && acc < bestD) {
        val d = v.getDouble(i) - c(i)
        acc += d * d
        i += 1
      }
      if (ok && acc < bestD) { bestD = acc; best = j }
      j += 1
    }
    centroidIds(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val ids = ctx.addReferenceObj("ivfCentroidIds", centroidIds, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      s"""
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  double[] $c = $mat[$j];
         |  if ($v.numElements() == $c.length) {
         |    double $acc = 0.0;
         |    // early abandon: a prefix >= bestD can never win the strict-< scan
         |    for (int $i = 0; $i < $c.length && $acc < $bestD; $i++) {
         |      double $d = $v.getDouble($i) - $c[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $j; }
         |  }
         |}
         |${ev.value} = $ids[$best];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfArgmin =
    copy(child = newChild)
}

/**
 * `ivf_superprobe(array<double>)` — the cell-pruning half of the EXACT
 * two-level IVF assignment ([[graft.operators.AnnIndex.ivfAssign]] past its
 * driver-side centroid cap): emits the ids of every super-centroid CELL that
 * could contain the globally nearest fine centroid, by the classic
 * triangle-inequality bound (Moore '00 anchors / FAISS coarse quantizer
 * pruning):
 *
 *  - every super IS itself a fine centroid, so
 *    `ub = min_s d(v, s)` upper-bounds the winner's distance;
 *  - a cell with super s and member radius `r_s = max_c d(c, s)` satisfies
 *    `min_{c in cell} d(v, c) >= d(v, s) - r_s`, so any cell with
 *    `d(v, s) - r_s > ub` cannot hold the winner and is pruned.
 *
 * `eps` (absolute, on the distance scale) absorbs floating-point rounding in
 * the bound arithmetic — it can only ADD probe cells, never drop one, so
 * exactness of the two-level argmin is preserved. The nearest cell always
 * passes its own bound, so the probe list is never empty. Matrix, ids and
 * radii ride as expression fields (g = ~sqrt(k) supers — driver-bounded);
 * the loop runs as one generated-code call per row.
 */
case class IvfSuperProbe(
    child: Expression,
    supers: Array[Array[Double]],
    superIds: Array[Int],
    radii: Array[Double],
    eps: Double,
    // emit struct<cells: array<int>, ub2: double> instead of the bare cell
    // array: ub2 = (min_s d(v,s))^2 is EXACT (no eps) and, because every
    // super is itself a fine centroid, upper-bounds the winning fine
    // centroid's squared distance — the refine leg feeds it to
    // [[L2SquaredBounded]] so each candidate distance early-abandons at the
    // tightest bound available before any candidate is touched (r9 #7)
    emitUb: Boolean = false) extends UnaryExpression {
  override def dataType: DataType =
    if (emitUb)
      StructType(Seq(
        StructField("cells", ArrayType(IntegerType, containsNull = false), nullable = false),
        StructField("ub2", DoubleType, nullable = false)))
    else ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_superprobe"

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ivf_superprobe needs array<double>, got ${other.catalogString}")
  }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    if (emitUb) IvfSuperProbe.computeWithUb(input.asInstanceOf[ArrayData], supers, superIds, radii, eps)
    else IvfSuperProbe.compute(input.asInstanceOf[ArrayData], supers, superIds, radii, eps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("superCentroids", supers, "double[][]")
    val ids = ctx.addReferenceObj("superIds", superIds, "int[]")
    val rad = ctx.addReferenceObj("superRadii", radii, "double[]")
    val fn = if (emitUb) "computeWithUb" else "compute"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IvfSuperProbe.$fn($v, $mat, $ids, $rad, $eps);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfSuperProbe =
    copy(child = newChild)
}

object IvfSuperProbe {
  /** Returns (candidate cells, min Euclidean distance, min SQUARED distance).
   * The squared minimum is tracked directly from the accumulator — NOT
   * recovered as sqrt(min)^2, whose round-trip can land 1 ulp below the true
   * minimum squared distance and (since the nearest super is itself a refine
   * candidate) let an abandoned near-tie candidate undercut the winner at
   * ulp resolution (ADVICE r10). Radius pruning still uses the Euclidean
   * form, matching the triangle-inequality bound's units. */
  private def cellsAndUb(
      v: ArrayData,
      supers: Array[Array[Double]],
      superIds: Array[Int],
      radii: Array[Double],
      eps: Double): (Array[Int], Double, Double) = {
    val g = supers.length
    val dist = new Array[Double](g)
    var ub = Double.PositiveInfinity
    var ubSq = Double.PositiveInfinity
    var j = 0
    while (j < g) {
      val c = supers(j)
      var acc = 0.0
      var i = 0
      val ok = v.numElements() == c.length
      while (ok && i < c.length) {
        val d = v.getDouble(i) - c(i)
        acc += d * d
        i += 1
      }
      val accOk = if (ok) acc else Double.PositiveInfinity
      val dj = math.sqrt(accOk)
      dist(j) = dj
      if (dj < ub) ub = dj
      if (accOk < ubSq) ubSq = accOk
      j += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Int](4)
    j = 0
    while (j < g) {
      if (dist(j) - radii(j) <= ub + eps) out += superIds(j)
      j += 1
    }
    (out.toArray, ub, ubSq)
  }

  def compute(
      v: ArrayData,
      supers: Array[Array[Double]],
      superIds: Array[Int],
      radii: Array[Double],
      eps: Double): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cellsAndUb(v, supers, superIds, radii, eps)._1)

  def computeWithUb(
      v: ArrayData,
      supers: Array[Array[Double]],
      superIds: Array[Int],
      radii: Array[Double],
      eps: Double): org.apache.spark.sql.catalyst.InternalRow = {
    val (cells, _, ubSq) = cellsAndUb(v, supers, superIds, radii, eps)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(cells),
      if (ubSq.isInfinite) Double.MaxValue else ubSq))
  }
}

/**
 * `simhash64(array<string>)` — 64-bit SimHash over a token array, one
 * xxhash64 (seed 42, identical to Spark's `xxhash64` builtin) per token and
 * one 64-way counter update, all in generated code. Replaces a doubly-nested
 * `aggregate` that hashed every token 64 times.
 */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] >= 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
}

/**
 * `simhash64_md5(array<string>)` — [[SimHash64]] on an md5 substrate: each
 * token's 64 hash bits are the FIRST 8 BYTES of md5(token), big-endian, so
 * the fingerprint is reproducible from md5's hex form in any engine (DuckDB
 * recomputes it digit-for-digit — see q96's oracle) while the voting loop
 * runs as one tight generated-code pass, not 64 interpreted HOF scans per
 * chunk. Same vote/tie semantics as [[SimHash64]] (+1/−1 per occurrence,
 * ties set the bit); only the per-token hash differs.
 */
case class Md5SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_md5"

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64_md5 needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Md5SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash64 = copy(child = newChild)
}

object Md5SimHash64 {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): Long = {
    val md = mdPool.get()
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
          ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/**
 * `l1_dist(array<long>, array<long>)` — L1 (Manhattan) distance between two
 * integer vectors, e.g. byte histograms. The workhorse of cheap
 * edit-distance pruning: each Levenshtein edit changes a character
 * frequency histogram by at most 2, so `lev(a,b) >= l1_dist(hist_a,
 * hist_b) / 2` — an exact lower bound that lets a blocked pair join discard
 * the vast majority of candidates in O(bins) before the O(len^2) distance.
 * NULL on dimension mismatch, like [[DotProduct]].
 */
case class L1Distance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "l1_dist"

  override def checkInputDataTypes() = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l1_dist needs two array<bigint> inputs, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += (if (d < 0) -d else d)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += ($d < 0) ? -$d : $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L1Distance = copy(l, r)
}

object VectorFunctions {
  /** Register `dot_d` and `simhash64` for SQL/expr use; idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_d", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l1_dist", exprs => L1Distance(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq", exprs => L2Squared(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq_bounded", exprs => L2SquaredBounded(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64_md5", exprs => Md5SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow", exprs => RollingFingerprint(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_md5", exprs => Md5Winnow(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_hash20", exprs => Md5GramHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash8", exprs => MinHash8(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "punct_count", exprs => PunctCount(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams", exprs => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"gram width must be an int literal, got $other")
        }
        CharNgrams(exprs.head, n)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => {
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"shingle width must be an int literal, got $other")
        }
        WordShingles(exprs.head, k)
      }, "scala_udf")
    // hash-aggregable min_by(id, struct(dist, id)) — see ArgminPair scaladoc
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "argmin_pair", exprs => ArgminPair(exprs(0), exprs(1)), "scala_udf")
  }
}
