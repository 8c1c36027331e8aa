package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.{IvfSuperProbe, L2SquaredBounded}

/**
 * Property pins for the two r11 ulp-tier fixes (VERDICT r11 #6) whose
 * original failure modes were data-dependent:
 *
 *  1. the exact ub2 bound (`VectorFunctions.IvfSuperProbe.computeWithUb`):
 *     near-tie refine candidates AT the bound must never undercut the true
 *     argmin winner through the early-abandoning kernel — the r10 hazard was
 *     a sqrt-roundtripped bound landing 1 ulp below the true minimum;
 *  2. the microsecond-exact watermark cut (`StreamReplay.maxEventTsUs`):
 *     sub-millisecond timestamp slivers around the cut must survive the
 *     driver pull exactly — the r10 hazard was a getTimestamp.getTime pull
 *     ms-truncating the cutoff up to 999 us below the oracle's.
 */
object R12FixProps extends Properties("R12Fixes") {

  // --- 1. exact ub2 + bounded-kernel refine on near-tie candidates ---

  private val dims = 8

  /** Base vectors plus clusters of NEAR-TIE perturbations: several centroids
   * at (near-)identical distance from the query, differing by 0 or 1 ulp-ish
   * amounts — the regime where an inexact bound flips the argmin. */
  private val genNearTie: Gen[(Array[Double], Array[Array[Double]])] = for {
    v <- Gen.listOfN(dims, Gen.chooseNum(-1000000, 1000000).map(_ / 1e4))
    base <- Gen.listOfN(dims, Gen.chooseNum(-1000000, 1000000).map(_ / 1e4))
    nCents <- Gen.chooseNum(2, 8)
    // perturbation exponents chosen so deltas range from exact duplicates
    // through 1e-12 (ulp scale at these magnitudes) up to clearly-distinct
    perturbs <- Gen.listOfN(nCents, Gen.listOfN(dims,
      Gen.oneOf(0.0, 1e-13, -1e-13, 1e-12, -1e-12, 1e-9, 1.0)))
  } yield (
    v.toArray,
    perturbs.map(p => base.toArray.zip(p).map { case (b, d) => b + d }).toArray)

  /** Reference distance: the SAME left-to-right accumulation every kernel
   * in the family uses (exactness claims are per-accumulation-order). */
  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  property("superprobe ub2 is exactly the min accumulated squared super-distance") =
    forAll(genNearTie) { case (v, cents) =>
      val radii = Array.fill(cents.length)(0.0)
      val ids = Array.tabulate(cents.length)(identity)
      val row = IvfSuperProbe.computeWithUb(
        new GenericArrayData(v), cents, ids, radii, eps = 1e-9)
      val ub2 = row.getDouble(1)
      // EXACT equality, not tolerance: the fix tracks the squared minimum
      // straight from the accumulator, so it must be bit-identical to the
      // naive recomputation under the same accumulation order
      ub2 == cents.map(c => d2(v, c)).min
    }

  property("bounded refine argmin at bound=ub2 equals the exact argmin under near-ties") =
    forAll(genNearTie) { case (v, cents) =>
      val radii = Array.fill(cents.length)(0.0)
      val ids = Array.tabulate(cents.length)(identity)
      val ub2 = IvfSuperProbe.computeWithUb(
        new GenericArrayData(v), cents, ids, radii, eps = 1e-9).getDouble(1)
      // the refine leg's kernel, driven through the real expression eval:
      // candidates = the super set itself (every super is a fine centroid,
      // so the winner's exact distance is <= ub2 by construction)
      def lit(a: Array[Double]) =
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          new GenericArrayData(a), ArrayType(DoubleType, containsNull = false))
      def litD(x: Double) =
        org.apache.spark.sql.catalyst.expressions.Literal.create(x, DoubleType)
      val bounded = cents.zipWithIndex.map { case (c, j) =>
        (L2SquaredBounded(lit(v), lit(c), litD(ub2)).eval(null).asInstanceOf[Double], j)
      }
      val exact = cents.zipWithIndex.map { case (c, j) => (d2(v, c), j) }
      // the argmin (distance, then id — the assignment tie-break) must agree:
      // a bound even 1 ulp under the true minimum abandons the winner mid-loop
      // and can hand the argmin to a near-tie loser (the ADVICE r10 hazard)
      bounded.min == exact.min
    }

  // --- punct_count kernel == the regex it replaces, on arbitrary Unicode ---

  private val genUnicodeText: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar,
    2 -> Gen.const(' '),
    2 -> Gen.oneOf('!', '.', ',', '@', '\n', '\t'),
    1 -> Gen.oneOf('ü', 'é', '中', '→'),            // multi-byte BMP
    1 -> Gen.const("😀"),                 // supplementary (4-byte UTF-8)
    1 -> Gen.const("𝕏")                             // another supplementary
  ).map(_.toString)).map(_.mkString)

  property("punct_count equals regexp_count(s, '[^A-Za-z0-9 ]') per code point") =
    forAll(genUnicodeText) { s =>
      val kernel = graft.functions.PunctCount.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val regex = java.util.regex.Pattern.compile("[^A-Za-z0-9 ]")
        .matcher(s).results().count().toInt
      kernel == regex
    }

  // --- 2. microsecond-exact watermark pull around the cut ---

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("r12-fix-props")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Epoch-micros around a realistic base, with the generator BIASED toward
   * sub-millisecond slivers (xxx999 / xxx001 endings) — the exact population
   * a ms-truncating pull mangles. */
  private val baseUs = 1600000000L * 1000000L
  private val genUsList: Gen[List[Long]] = for {
    n <- Gen.chooseNum(1, 12)
    us <- Gen.listOfN(n, for {
      sec <- Gen.chooseNum(0L, 7L * 24 * 3600)
      sub <- Gen.oneOf(Gen.chooseNum(0L, 999999L), Gen.oneOf(999999L, 999001L, 1L, 500999L))
    } yield baseUs + sec * 1000000L + sub)
  } yield us

  property("maxEventTsUs pulls the max timestamp micro-exactly (sub-ms slivers survive)") =
    forAll(genUsList) { usList =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, expr}
      val ev = usList.toDF("us")
        .select(expr("timestamp_micros(us)").as("ts"),
          org.apache.spark.sql.functions.lit("purchase").as("event_type"))
      val pulled = graft.streaming.StreamReplay.maxEventTsUs(ev, "purchase")
      // the replay's left-outer cut keeps p_us < cutoff; a ms-truncated pull
      // shifts the cutoff down up to 999us and flips rows in that sliver, so
      // the pull itself must be exact — compare against the raw long max
      pulled == usList.max
    }

  // Spark-backed property: cap the case count so the suite stays fast
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(math.min(p.minSuccessfulTests, 40))
}
