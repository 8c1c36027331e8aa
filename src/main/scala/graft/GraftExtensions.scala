package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{ByteHistogram, DotProduct, RollingFingerprint, SimHash64}

/**
 * Session extensions registering graft's native functions at session build:
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
 * // or: --conf spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * After which `byte_histogram`, `dot_d`, `simhash64` resolve in any SQL text
 * without per-session manual registration (the operators also self-register
 * defensively, so either path works).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("byte_histogram"),
      info("byte_histogram", "byte_histogram(binary, bins) - bucketed byte-value histogram"),
      (exprs: Seq[Expression]) => {
        val bins = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"bins must be an int literal, got $other")
        }
        ByteHistogram(exprs.head, bins)
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_d"),
      info("dot_d", "dot_d(array<double>, array<double>) - dot product, codegen"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("winnow"),
      info("winnow", "winnow(string) - winnowing document fingerprints (rolling-hash minima)"),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs.head)
    ))
  }
}
