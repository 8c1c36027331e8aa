package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{Md5GramHash, PqAdcDist, PqEncodeDigest, PqKernelUtil}
import graft.operators.VectorOps

/** Property tests for the round-5 kernels on ARBITRARY inputs (the specs +
 * DuckDB oracle cover the corpus fixtures; these cover anything ScalaCheck
 * can produce). All pure JVM — no Spark session. */
object Round5KernelProps extends Properties("Round5Kernels") {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // --- Md5GramHash: kernel == naive substring/md5-prefix/distinct/sort ---

  private val genText: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ Seq(' ')))).map(_.mkString)

  property("gram_hash20 equals the naive distinct-sorted md5-prefix set") =
    forAll(genText) { s =>
      val got = Md5GramHash.compute(s).toSeq
      val want: Seq[Long] =
        if (s.length < 20) Seq.empty
        else (0 to s.length - 20)
          .map(i => java.lang.Long.parseLong(md5hex(s.substring(i, i + 20)).substring(0, 15), 16))
          .distinct.sorted
      got == want
    }

  // --- PQ kernels: random vectors + random codebooks ---

  private val genE6Vec: Gen[Array[Double]] =
    Gen.listOfN(64, Gen.chooseNum(-999999, 999999).map(_ / 1e6)).map(_.toArray)

  private val genCodebook: Gen[Array[Array[Array[Long]]]] =
    Gen.listOfN(32 * 64 * 2, Gen.chooseNum(-1000000L, 1000000L)).map { xs =>
      val it = xs.iterator
      Array.fill(32, 64, 2)(it.next())
    }

  private def e6v(v: Array[Double]): Array[Long] = v.map(PqKernelUtil.e6)

  /** Naive reference encode: argmin with (d2, j) order per 2-dim subspace. */
  private def refCodes(v: Array[Long], cb: Array[Array[Array[Long]]]): Array[Int] =
    Array.tabulate(32) { s =>
      (0 until 64).minBy { j =>
        val d0 = v(s * 2) - cb(s)(j)(0); val d1 = v(s * 2 + 1) - cb(s)(j)(1)
        (d0 * d0 + d1 * d1, j)
      }
    }

  property("pq_adc equals LUT-sum over the naive argmin encoding") =
    forAll(genE6Vec, genCodebook, genE6Vec) { (vec, cb, qv) =>
      val q = e6v(qv)
      val lut = Array.tabulate(32, 64) { (s, j) =>
        val d0 = q(s * 2) - cb(s)(j)(0); val d1 = q(s * 2 + 1) - cb(s)(j)(1)
        d0 * d0 + d1 * d1
      }
      val kernel = PqAdcDist(org.apache.spark.sql.catalyst.expressions.Literal(1), cb, lut)
      val got = kernel.compute(ArrayData.toArrayData(vec))
      val codes = refCodes(e6v(vec), cb)
      got == (0 until 32).map(s => lut(s)(codes(s))).sum
    }

  property("pq_digest agrees with the naive encoding's digest and exact error") =
    forAll(genE6Vec, genCodebook) { (vec, cb) =>
      val kernel = PqEncodeDigest(org.apache.spark.sql.catalyst.expressions.Literal(1), cb)
      val row = kernel.compute(ArrayData.toArrayData(vec))
      val v = e6v(vec)
      val codes = refCodes(v, cb)
      val err = (0 until 32).map { s =>
        val j = codes(s)
        val d0 = v(s * 2) - cb(s)(j)(0); val d1 = v(s * 2 + 1) - cb(s)(j)(1)
        d0 * d0 + d1 * d1
      }.sum
      row.getLong(0) == codes.zipWithIndex.map { case (j, s) => j.toLong * (s + 1) }.sum &&
        row.getInt(1) == codes.min && row.getInt(2) == codes.max && row.getLong(3) == err
    }

  // --- trainPqCodebook: Lloyd monotonicity + determinism on random data ---

  private val genSample: Gen[Array[Array[Long]]] =
    Gen.chooseNum(64, 200).flatMap(n =>
      Gen.listOfN(n * 64, Gen.chooseNum(-1000000L, 1000000L)).map { xs =>
        val it = xs.iterator
        Array.fill(n, 64)(it.next())
      })

  private def distortion(sample: Array[Array[Long]], cb: Array[Array[Array[Long]]]): BigInt =
    sample.map { v =>
      (0 until 32).map { s =>
        (0 until 64).map { j =>
          val d0 = v(s * 2) - cb(s)(j)(0); val d1 = v(s * 2 + 1) - cb(s)(j)(1)
          BigInt(d0 * d0 + d1 * d1)
        }.min
      }.sum
    }.sum

  property("trainPqCodebook is deterministic; distortion obeys the truncated-Lloyd bound") =
    forAll(genSample) { sample =>
      val seeds = sample.take(64)
      if (seeds.length < 64) true
      else {
        val cb0 = VectorOps.trainPqCodebook(seeds, sample, 0)
        val cb4a = VectorOps.trainPqCodebook(seeds, sample, 4)
        val cb4b = VectorOps.trainPqCodebook(seeds, sample, 4)
        // Exact Lloyd never increases distortion; TRUNCATING each mean to an
        // integer can add at most ||m* - trunc(m*)||^2 < 2 per assigned
        // point per subspace per round — so the trained distortion is
        // bounded by seed distortion + 4 rounds * 32 subspaces * 2n.
        val slack = BigInt(4L * 32L * 2L * sample.length)
        cb4a.flatten.flatten.toSeq == cb4b.flatten.flatten.toSeq &&
          distortion(sample, cb4a) <= distortion(sample, cb0) + slack
      }
    }
}
