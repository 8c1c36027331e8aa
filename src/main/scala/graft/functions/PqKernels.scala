package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen kernels for the trained-product-quantization path
 * (Jégou et al., PAMI 2011; [[graft.operators.VectorOps]] trains the
 * codebook). The encode is an argmin over 64 codewords × 2 dims in each of
 * 32 subspaces — 4096 integer ops per row. As a SQL higher-order-function
 * fold that work is INTERPRETED (Spark HOFs are CodegenFallback) and each
 * inner `aggregate`/`transform` call carries per-invocation overhead that
 * dwarfs the two multiplies inside it — measured 2.2 s for the ADC search
 * at sf0.1 where the 8×16 geometry's fold took 0.4 s. These kernels run the
 * same arithmetic as tight JVM loops over primitive arrays (the codebook
 * and LUT ride along as expression FIELDS, serialized once per task, never
 * re-constructed per row), bringing the search back under half a second.
 *
 * Determinism contract (shared digit-for-digit with the DuckDB oracle's
 * unrolled-Lloyd CTEs): e6 quantization via BigDecimal HALF_UP — exactly
 * SQL `round(cast(x as double) * 1e6)` in both engines — exact integer
 * squared distances, strict-< argmin with lowest-j tie-break.
 *
 * The codebook/LUT fields are compared by REFERENCE in case-class equality
 * (Array equals), so two kernels with different trained codebooks can never
 * be canonicalized into one — the safe direction for exchange reuse.
 */
object PqKernelUtil {
  def e6(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** e6-quantize an embedding array (float or double elements). */
  def toE6(arr: ArrayData, isFloat: Boolean): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = e6(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    out
  }

  /** Argmin codeword of subspace `s` for e6 vector `v`: strict <, lowest j
   * on ties — the (d2 ASC, j ASC) order the oracle's row_number uses. */
  def encodeSub(v: Array[Long], s: Int, cbs: Array[Array[Long]]): Int = {
    val ds = cbs(0).length
    var best = 0
    var bestD = Long.MaxValue
    var j = 0
    while (j < cbs.length) {
      var d2 = 0L
      var d = 0
      while (d < ds) { val df = v(s * ds + d) - cbs(j)(d); d2 += df * df; d += 1 }
      if (d2 < bestD) { bestD = d2; best = j }
      j += 1
    }
    best
  }

  def checkArray(dt: DataType, name: String) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$name needs ARRAY<FLOAT|DOUBLE> input, got ${other.catalogString}")
  }
}

/** `pq_adc(embedding)` → asymmetric-distance (ADC) sum: encode the row
 * against the trained codebook and sum the query-side LUT entries of the
 * chosen codewords. One long out per row; no join, no shuffle. */
case class PqAdcDist(
    child: Expression,
    cb: Array[Array[Array[Long]]],
    lut: Array[Array[Long]]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"
  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes() = PqKernelUtil.checkArray(child.dataType, prettyName)

  def compute(arr: ArrayData): Long = {
    val v = PqKernelUtil.toE6(arr, isFloat)
    var acc = 0L
    var s = 0
    while (s < cb.length) {
      acc += lut(s)(PqKernelUtil.encodeSub(v, s, cb(s)))
      s += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDist].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcDist = copy(child = newChild)
}

/** `pq_digest(embedding)` → struct(code_sum, code_min, code_max,
 * pq_err_e12): the per-vector PQ code digest q92 reports (192-bit codes do
 * not fit one BIGINT, so the oracle-stable summary is a positionally
 * weighted sum plus min/max) and the exact total quantization error. */
case class PqEncodeDigest(
    child: Expression,
    cb: Array[Array[Array[Long]]]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("code_sum", LongType, nullable = false),
    StructField("code_min", IntegerType, nullable = false),
    StructField("code_max", IntegerType, nullable = false),
    StructField("pq_err_e12", LongType, nullable = false)))
  override def prettyName: String = "pq_digest"
  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes() = PqKernelUtil.checkArray(child.dataType, prettyName)

  def compute(arr: ArrayData): InternalRow = {
    val v = PqKernelUtil.toE6(arr, isFloat)
    var codeSum = 0L
    var codeMin = Int.MaxValue
    var codeMax = -1
    var err = 0L
    var s = 0
    while (s < cb.length) {
      val cbs = cb(s)
      val j = PqKernelUtil.encodeSub(v, s, cbs)
      val ds = cbs(0).length
      var d2 = 0L
      var d = 0
      while (d < ds) { val df = v(s * ds + d) - cbs(j)(d); d2 += df * df; d += 1 }
      codeSum += j.toLong * (s + 1)
      if (j < codeMin) codeMin = j
      if (j > codeMax) codeMax = j
      err += d2
      s += 1
    }
    InternalRow(codeSum, codeMin, codeMax, err)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("pqDigest", this, classOf[PqEncodeDigest].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeDigest = copy(child = newChild)
}
