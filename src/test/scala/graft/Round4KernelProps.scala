package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{Md5SimHash64, Md5Winnow, TopKAgg}

/** Property tests for the round-4 kernels on ARBITRARY inputs (the
 * OperatorsSpec equality tests cover the corpus fixtures; these cover any
 * token list / string / score stream ScalaCheck can produce). All pure JVM
 * — no Spark session. */
object Round4KernelProps extends Properties("Round4Kernels") {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // --- Md5SimHash64: kernel == direct bit-vote formula over md5 hex ---

  private val genTokens: Gen[List[String]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 8).flatMap(m => Gen.listOfN(m, Gen.alphaNumChar).map(_.mkString))))

  property("simhash64_md5 equals the per-bit vote over md5-hex bits") =
    forAll(genTokens) { toks =>
      val got = Md5SimHash64.compute(
        ArrayData.toArrayData(toks.map(t => UTF8String.fromString(t)).toArray))
      var want = 0L
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val h = java.lang.Long.parseUnsignedLong(md5hex(t).substring(0, 16), 16)
        (0 until 64).foreach(b => counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1))
      }
      (0 until 64).foreach(b => if (counts(b) >= 0) want |= (1L << b))
      got == want
    }

  // --- Md5Winnow: kernel == naive window-min reimplementation ---

  private val genText: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ Seq(' ')))).map(_.mkString)

  property("winnow_md5 equals the naive rightmost-window-min selection") =
    forAll(genText) { s =>
      val got = Md5Winnow.compute(s).toSeq
      val want: Seq[Long] =
        if (s.length < Md5Winnow.K || s.length - Md5Winnow.K + 1 < Md5Winnow.W) Seq.empty
        else {
          val ts = (1 to s.length - Md5Winnow.K + 1).map { p =>
            val h = java.lang.Long.parseLong(md5hex(s.substring(p - 1, p - 1 + Md5Winnow.K)).substring(0, 8), 16)
            h * 2147483648L + (2147483647L - p)
          }
          (0 to ts.length - Md5Winnow.W).map(i => ts.slice(i, i + Md5Winnow.W).min / 2147483648L)
            .distinct.sorted
        }
      got == want
    }

  // --- TopKAgg: any reduce/merge interleaving equals global sort-take ---

  private val genScores: Gen[List[(Double, Long)]] =
    Gen.chooseNum(0, 50).flatMap(n => Gen.listOfN(n,
      for { c <- Gen.chooseNum(-100, 100); id <- Gen.chooseNum(0L, 30L) } yield (c / 10.0, id)))

  property("TopKAgg reduce-then-merge equals global (score desc, id asc) take-k") =
    forAll(genScores, Gen.chooseNum(1, 7), Gen.chooseNum(1, 5)) { (xs, k, nParts) =>
      val agg = new TopKAgg(k)
      // split into nParts buffers (arbitrary partitioning), reduce each, merge all
      val parts = xs.zipWithIndex.groupBy(_._2 % nParts).values.map(_.map(_._1))
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)
      val want = xs.sortBy { case (c, id) => (-c, id) }.take(k)
      agg.finish(merged) == want
    }
}
