package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{ByteHistogram, CharNgrams, DotProduct, L1Distance, MinHash8, NgramHashHistogram, RollingFingerprint, SimHash64, WordShingles}
import graft.plans.WhisperSortElision

/**
 * Session extensions registering graft's native functions and plan rules at
 * session build:
 *
 * {{{
 * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
 * // or: --conf spark.sql.extensions=graft.GraftExtensions
 * }}}
 *
 * After which `byte_histogram`, `dot_d`, `simhash64` resolve in any SQL text
 * without per-session manual registration (the operators also self-register
 * defensively, so either path works), and redundant global sorts over
 * time-ordered whisper scans are elided ([[graft.plans.WhisperSortElision]]).
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
      FunctionIdentifier("l1_dist"),
      info("l1_dist", "l1_dist(array<bigint>, array<bigint>) - L1 distance, codegen"),
      (exprs: Seq[Expression]) => L1Distance(exprs(0), exprs(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("ngram_hist"),
      info("ngram_hist", "ngram_hist(string, n, bins) - hashed character-n-gram profile"),
      (exprs: Seq[Expression]) => NgramHashHistogram.fromExprs(exprs)
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash of a token array"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash64_md5"),
      info("simhash64_md5", "simhash64_md5(array<string>) - 64-bit SimHash on the md5 substrate (engine-portable)"),
      (exprs: Seq[Expression]) => graft.functions.Md5SimHash64(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      info("char_ngrams", "char_ngrams(string, n) - distinct character n-grams, first-occurrence order"),
      (exprs: Seq[Expression]) => {
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"gram width must be an int literal, got $other")
        }
        CharNgrams(exprs.head, n)
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(string, k) - distinct k-word shingles, first-occurrence order"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"shingle width must be an int literal, got $other")
        }
        WordShingles(exprs.head, k)
      }
    ))
    ext.injectFunction((
      FunctionIdentifier("punct_count"),
      info("punct_count", "punct_count(string) - code points outside [A-Za-z0-9 ], == regexp_count(s, '[^A-Za-z0-9 ]')"),
      (exprs: Seq[Expression]) => graft.functions.PunctCount(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("minhash8"),
      info("minhash8", "minhash8(array<string>) - 8-slot md5 MinHash signature"),
      (exprs: Seq[Expression]) => MinHash8(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("winnow"),
      info("winnow", "winnow(string) - winnowing document fingerprints (rolling-hash minima)"),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("winnow_md5"),
      info("winnow_md5", "winnow_md5(string) - winnowing fingerprints on the md5 substrate (engine-portable)"),
      (exprs: Seq[Expression]) => graft.functions.Md5Winnow(exprs.head)
    ))
    // physical, in AQE query-stage prep: after EnsureRequirements, where the
    // scan (with pushed predicates and planned partitions) and the redundant
    // Sort+Exchange pair are both visible
    ext.injectQueryStagePrepRule(WhisperSortElision(_))
  }
}
