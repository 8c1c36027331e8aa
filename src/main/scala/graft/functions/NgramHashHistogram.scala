package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/**
 * `ngram_hist(string, n, bins)` — hashed character-n-gram profile of a
 * string: a `bins`-bucket histogram counting every length-`n` substring by
 * its polynomial hash. Native Catalyst expression with whole-stage codegen
 * (the per-doc precompute of the q-gram count filter; a UDF here would box
 * every document).
 *
 * The q-gram count filter (Gravano et al., "Approximate String Joins in a
 * Database (Almost) for Free", VLDB 2001) is the workhorse edit-distance
 * prune: one edit creates/destroys at most `n` n-grams per side, so
 * `lev(a,b) >= L1(profile_a, profile_b) / (2n)`. Bucket-hashing the grams
 * only MERGES profile entries, which can only lower the L1 — so the bound
 * stays exact (no false negatives) at any `bins`, while dissimilar texts
 * keep `L1 ~ 2 * (len - n + 1)`, far above the threshold. Character
 * histograms (`byte_histogram`) fail as this prune when documents share a
 * vocabulary — same letter distribution, tiny L1 — whereas n >= 3 grams
 * carry word identity.
 *
 * Hashing is over UTF-16 code units (String.charAt), deterministic and
 * endianness-free; n is capped small (<= 8) since the filter's strength
 * decays as 1/(2n).
 *
 * BOUND SCOPE: the `lev >= L1/(2n)` guarantee holds when one edited
 * codepoint occupies one UTF-16 unit — i.e. for BMP text. A non-BMP
 * codepoint (surrogate pair) spans two units, so one edit can touch n+1
 * windows and the divisor would need to be 2n+2. Callers pruning
 * Levenshtein joins should scope to BMP (or, as
 * [[graft.operators.DedupOps.levenshteinDedup]] does, ASCII) or use the
 * looser divisor.
 */
case class NgramHashHistogram(child: Expression, n: Int, bins: Int) extends UnaryExpression {
  require(n >= 1 && n <= 8, s"n must be in 1..8, got $n")
  require(bins > 0 && (bins & (bins - 1)) == 0, s"bins must be a power of two, got $bins")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ngram_hist needs STRING input, got ${child.dataType.catalogString}")
  }
  override def prettyName: String = "ngram_hist"

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val hist = new Array[Long](bins)
    val last = s.length - n
    var i = 0
    while (i <= last) {
      var h = 0
      var j = 0
      while (j < n) { h = h * 31 + s.charAt(i + j); j += 1 }
      hist(h & (bins - 1)) += 1L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hist = ctx.freshName("hist")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |long[] $hist = new long[$bins];
         |String $s = $c.toString();
         |for (int $i = 0; $i <= $s.length() - $n; $i++) {
         |  int $h = 0;
         |  for (int $j = 0; $j < $n; $j++) { $h = $h * 31 + $s.charAt($i + $j); }
         |  $hist[$h & ${bins - 1}]++;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($hist);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramHashHistogram = copy(child = newChild)
}

object NgramHashHistogram {
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  def fromExprs(exprs: Seq[Expression]): NgramHashHistogram =
    NgramHashHistogram(exprs.head, intLit(exprs(1), "n"), intLit(exprs(2), "bins"))

  /** Register `ngram_hist(string, n, bins)` for SQL/expr use; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_hist", fromExprs, "scala_udf")
}
