package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `word_shingles(text)` with fixed shingle width k — the distinct k-word
 * shingles of a string in first-occurrence order, equivalent to
 *
 * {{{
 *   array_distinct(transform(sequence(1, size(arr) - k + 1),
 *     i -> concat_ws(' ', element_at(arr, i), ..., element_at(arr, i+k-1))))
 *   -- where arr = split(text, ' ')
 * }}}
 *
 * Key identity: `split` on a single space keeps empty tokens and
 * `concat_ws(' ', ...)` re-joins them verbatim, so shingle i is EXACTLY the
 * byte slice of the original text from the start of word i to the end of
 * word i+k-1. No token array, no string building — just boundary scanning
 * and slicing, in one pass (the HOF form pays 3 interpreted lambdas and an
 * array materialization per position).
 *
 * Fewer than k words yields an empty array (callers guard with
 * `size(split(text,' ')) >= k`, under which semantics are identical).
 */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)
}

object WordShingles {
  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val bytes = text.getBytes // UTF-8; ' ' (0x20) never occurs inside a multibyte sequence
    val len = bytes.length
    // word start offsets: 0 and every byte after a space
    var nWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) nWords += 1; i += 1 }
    if (nWords < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nWords + 1)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = len + 1 // virtual separator past the end
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    while (s + k <= nWords) {
      val from = starts(s)
      val until = starts(s + k) - 1 // end of word s+k-1 (strip trailing separator)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      s += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
