package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.NgramHashHistogram

/** Property test for the q-gram count filter's exactness guarantee:
 * `L1(ngram_hist(a), ngram_hist(b)) <= 2n * levenshtein(a, b)` for BMP
 * (here: ASCII) strings — the bound [[graft.operators.DedupOps
 * .levenshteinDedup]] relies on to prune candidate pairs without false
 * negatives. Pure JVM (expression eval, no Spark session); the reference
 * Levenshtein is an independent test-local DP. */
object QGramBoundProps extends Properties("QGramBound") {

  private val words = Vector("key", "agg", "row", "scan", "slow", "fast", "table", "value", "hash", "sort")
  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(words))).map(_.mkString(" "))

  /** Random single-char edit: substitute, insert, or delete. */
  private val genEdit: Gen[String => String] = Gen.oneOf(
    for { c <- Gen.alphaChar; p <- Gen.chooseNum(0, 1000) } yield (s: String) =>
      if (s.isEmpty) c.toString else { val i = p % s.length; s.substring(0, i) + c + s.substring(i + 1) },
    for { c <- Gen.alphaChar; p <- Gen.chooseNum(0, 1000) } yield (s: String) =>
      { val i = if (s.isEmpty) 0 else p % (s.length + 1); s.substring(0, i) + c + s.substring(i) },
    Gen.chooseNum(0, 1000).map(p => (s: String) =>
      if (s.isEmpty) s else { val i = p % s.length; s.substring(0, i) + s.substring(i + 1) })
  )

  private def hist(s: String, n: Int, bins: Int): Array[Long] =
    NgramHashHistogram(Literal(s), n, bins).eval(null).asInstanceOf[ArrayData].toLongArray()

  private def l1(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.sum

  /** Test-local reference Levenshtein (full DP, no banding). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) => if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  property("L1(hist) <= 2n * lev for independent ASCII docs") =
    forAll(genDoc, genDoc) { (a, b) =>
      val n = 4
      l1(hist(a, n, 256), hist(b, n, 256)) <= 2L * n * lev(a, b)
    }

  property("L1(hist) <= 2n * edits for mutated docs (any n, bins)") =
    forAll(genDoc, Gen.listOfN(5, genEdit), Gen.oneOf(2, 3, 4, 6), Gen.oneOf(64, 256, 1024)) {
      (base, edits, n, bins) =>
        val mutated = edits.foldLeft(base)((s, e) => e(s))
        // lev <= number of applied edits, so the bound via TRUE lev is tighter
        l1(hist(base, n, bins), hist(mutated, n, bins)) <= 2L * n * lev(base, mutated)
    }
}
