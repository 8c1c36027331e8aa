package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `char_ngrams(text)` with a fixed gram width — the distinct character
 * n-grams of a string in first-occurrence order, equivalent to
 *
 * {{{
 *   array_distinct(transform(sequence(1, length(text) - n + 1),
 *                            i -> substring(text, i, n)))
 * }}}
 *
 * but in one generated-code pass. The HOF formulation evaluates an
 * interpreted lambda per character position (a corpus of L chars pays L
 * closure invocations, each doing a code-point scan from the string start —
 * O(L^2) per document); this walks the code points once and dedups through a
 * hash set. "Character" means Unicode code point, matching SQL `substring`.
 *
 * Strings shorter than n yield an empty array (`sequence(1, k)` with k < 1
 * is never evaluated by callers — they filter `length(text) >= n` first —
 * so the empty array matches the guarded semantics).
 */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_ngrams needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams = copy(child = newChild)
}

object CharNgrams {
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val len = s.codePointCount(0, s.length)
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // UTF-16 offset of each code point (so gram slicing is O(1) per window)
    val offs = new Array[Int](len + 1)
    var cp = 0
    var o = 0
    while (cp < len) {
      offs(cp) = o
      o += Character.charCount(s.codePointAt(o))
      cp += 1
    }
    offs(len) = s.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      seen.add(UTF8String.fromString(s.substring(offs(i), offs(i + n))))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/**
 * `punct_count(string)` — the number of Unicode code points NOT in
 * `[A-Za-z0-9 ]`, i.e. exactly `regexp_count(text, '[^A-Za-z0-9 ]')`
 * (both Java regex and RE2 match a negated character class one code point
 * at a time), in one generated-code byte scan.
 *
 * Why a kernel: Spark implements `regexp_count` as
 * `size(regexp_extract_all(...))` — it MATERIALIZES every match as a
 * string in an array. For the quality-scoring family (q21/q43/q62/q68/
 * q98/q111/q112) that regex was 97% of the whole formula's cost at scale
 * (24.1 s of 27 s over 500k docs, prof_quality r12). This scan is
 * zero-allocation: class members are ASCII, whose UTF-8 encodings are
 * single bytes that can never appear as continuation bytes, so counting
 * matching BYTES counts matching code points, and the total code-point
 * count is `numChars`.
 */
case class PunctCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"

  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"punct_count needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PunctCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PunctCount.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PunctCount = copy(child = newChild)
}

object PunctCount {
  def compute(s: UTF8String): Int = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var keep = 0
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9') || b == ' ') keep += 1
      i += 1
    }
    s.numChars() - keep
  }
}
