package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `minhash8(array<string>)` — 8-slot MinHash signature of a shingle set,
 * equivalent to the SQL formulation
 *
 * {{{
 *   transform(0..7, i -> array_min(transform(sharr,
 *     s -> substring(concat(md5(s), md5(concat('x', s))), 1 + 8*i, 8))))
 * }}}
 *
 * but in ONE pass: two MD5 digests per shingle, minima tracked as unsigned
 * 32-bit ints (lexicographic min over fixed-width lowercase hex == numeric
 * min), hex strings materialized only once at the end. The SQL version
 * allocates two hex strings plus eight 8-char substrings per shingle through
 * interpreted lambda evaluation — and Catalyst's CollapseProject happily
 * duplicates the digest subtree into each of the 8 projections, squaring the
 * damage. This expression replaces all of it with a tight loop.
 *
 * Oracle parity: DuckDB computes the identical signature from
 * `min(substr(md5(s)||md5('x'||s), 1+8*i, 8))` — md5 hex is engine-portable.
 *
 * Null semantics match `array_min` over md5: null/absent shingles are
 * skipped; an empty or all-null input yields NULL (matching array_min of an
 * empty array).
 */
case class MinHash8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash8"
  override def nullable: Boolean = true

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash8 needs array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHash8.compute(input.asInstanceOf[ArrayData])

  // Generated code delegates to the static kernel: the win is eliminating
  // per-element interpreted lambdas and intermediate arrays, not inlining.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHash8.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHash8 = copy(child = newChild)
}

object MinHash8 {
  private val mdPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** One unsigned-32 min per 8-hex-char slice; slices 0-3 from md5(s),
   * 4-7 from md5('x' || s). Returns null for an empty/all-null set. */
  def compute(arr: ArrayData): ArrayData = {
    val md = mdPool.get()
    val mins = new Array[Long](8)
    java.util.Arrays.fill(mins, 0xFFFFFFFFFFL) // > any u32: "unset" marker
    val n = arr.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val bytes = arr.getUTF8String(i).getBytes
        md.reset()
        val d1 = md.digest(bytes)
        md.reset()
        md.update('x'.toByte)
        val d2 = md.digest(bytes)
        var k = 0
        while (k < 4) {
          val v1 = ((d1(4 * k) & 0xFFL) << 24) | ((d1(4 * k + 1) & 0xFFL) << 16) |
            ((d1(4 * k + 2) & 0xFFL) << 8) | (d1(4 * k + 3) & 0xFFL)
          if (v1 < mins(k)) mins(k) = v1
          val v2 = ((d2(4 * k) & 0xFFL) << 24) | ((d2(4 * k + 1) & 0xFFL) << 16) |
            ((d2(4 * k + 2) & 0xFFL) << 8) | (d2(4 * k + 3) & 0xFFL)
          if (v2 < mins(k + 4)) mins(k + 4) = v2
          k += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    val out = new Array[Any](8)
    var k = 0
    while (k < 8) {
      val chars = new Array[Byte](8)
      var b = 0
      while (b < 8) {
        chars(b) = HEX(((mins(k) >>> ((7 - b) * 4)) & 0xF).toInt).toByte
        b += 1
      }
      out(k) = UTF8String.fromBytes(chars)
      k += 1
    }
    new GenericArrayData(out)
  }
}
