package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{Asset, AudioDecoder, ImageDecoder, VideoCodec}

/** Round-trip properties for the real in-JVM media codecs over randomized
 * geometry/content — the decode side must recover exactly what the encode
 * side synthesized, for ANY parameters, not just the q84/q85/q86 fixtures.
 * Pure JVM, no Spark session. */
object MediaCodecProps extends Properties("MediaCodec") {

  private val genPng: Gen[(Int, Int, Int)] = for {
    w <- Gen.chooseNum(1, 128)
    h <- Gen.chooseNum(1, 128)
    g <- Gen.chooseNum(0, 255)
  } yield (w, h, g)

  property("png encode->decode recovers geometry and pixel content") =
    forAll(genPng) { case (w, h, g) =>
      val d = ImageDecoder.decode(Asset(1L, "image/png", ImageDecoder.pngBytes(w, h, g), "prop"))
      d.width == w && d.height == h && d.px00 == g && d.n_frames == 1
    }

  private val genWav: Gen[(Long, Int, Int)] = for {
    id <- Gen.chooseNum(0L, 1000000L)
    n <- Gen.chooseNum(1, 4096)
    rate <- Gen.oneOf(8000, 16000, 44100)
  } yield (id, n, rate)

  property("wav encode->decode recovers format and exact sample sum") =
    forAll(genWav) { case (id, n, rate) =>
      val d = AudioDecoder.decode(Asset(id, "audio/wav", AudioDecoder.wavBytes(id, n, rate), "prop"))
      val expected = (0 until n).map(i => (id * 131 + i * 17) % 4096 - 2048).sum
      d.sample_rate == rate && d.channels == 1 && d.n_frames == n.toLong && d.pcm_sum == expected
    }

  private val genVideo: Gen[(Long, Int, Int)] = for {
    id <- Gen.chooseNum(0L, 1000000L)
    nf <- Gen.chooseNum(1, 48)
    step <- Gen.chooseNum(1, 7)
  } yield (id, nf, step)

  property("phash of a painted pattern IS the pattern; twin at hamming exactly 3") =
    forAll(Gen.chooseNum(0L, 1000000L)) { seed =>
      import MultimodalOps.PerceptualHash
      val bits = PerceptualHash.patternBits(seed)
      def chunk(j: Int): Int =
        (0 until 16).map(i => bits(16 * j + i) << (15 - i)).sum
      val base = PerceptualHash.phashChunks(PerceptualHash.patternPngBytes(seed, twin = false))
      val twin = PerceptualHash.phashChunks(PerceptualHash.patternPngBytes(seed, twin = true))
      val hamming =
        Integer.bitCount(base._1 ^ twin._1) + Integer.bitCount(base._2 ^ twin._2) +
          Integer.bitCount(base._3 ^ twin._3) + Integer.bitCount(base._4 ^ twin._4)
      // decoded-pixel hash equals the closed-form pattern (the oracle's
      // contract), the twin sits at exactly its 3 flips, and pigeonhole
      // leaves at least one clean 16-bit chunk for the LSH to bucket on
      base == ((chunk(0), chunk(1), chunk(2), chunk(3))) &&
        hamming == 3 &&
        (base._1 == twin._1 || base._2 == twin._2 || base._3 == twin._3 || base._4 == twin._4)
    }

  property("audio fingerprint of a painted track IS the bit pattern; twin at hamming exactly 3") =
    forAll(Gen.chooseNum(0L, 1000000L)) { seed =>
      import MultimodalOps.AudioFingerprint
      val bits = AudioFingerprint.fingerprintBits(seed)
      def chunk(j: Int): Int =
        (0 until 16).map(i => bits(16 * j + i) << (15 - i)).sum
      val base = AudioFingerprint.fingerprintChunks(AudioFingerprint.patternWavBytes(seed, twin = false))
      val twin = AudioFingerprint.fingerprintChunks(AudioFingerprint.patternWavBytes(seed, twin = true))
      val hamming =
        Integer.bitCount(base._1 ^ twin._1) + Integer.bitCount(base._2 ^ twin._2) +
          Integer.bitCount(base._3 ^ twin._3) + Integer.bitCount(base._4 ^ twin._4)
      base == ((chunk(0), chunk(1), chunk(2), chunk(3))) &&
        hamming == 3 &&
        (base._1 == twin._1 || base._2 == twin._2 || base._3 == twin._3 || base._4 == twin._4)
    }

  property("video phash sampling recovers each sampled frame's pattern; twin differs ONLY at frame 0") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(2, 8), Gen.chooseNum(1, 3)) {
      (vseed, nf, step) =>
        import MultimodalOps.{PerceptualHash, VideoPhash}
        def chunk(bits: Array[Int], j: Int): Int =
          (0 until 16).map(i => bits(16 * j + i) << (15 - i)).sum
        def expected(f: Int) = {
          val bits = PerceptualHash.patternBits(vseed * 8 + f)
          (chunk(bits, 0), chunk(bits, 1), chunk(bits, 2), chunk(bits, 3))
        }
        val base = VideoPhash
          .sampleFrameHashes(VideoPhash.videoPatternBytes(vseed, nf, twin = false), step).toSeq
        val twin = VideoPhash
          .sampleFrameHashes(VideoPhash.videoPatternBytes(vseed, nf, twin = true), step).toSeq
        base.map(_._1) == (0 until nf by step) &&
          base.forall { case (f, h) => h == expected(f) } &&
          twin.zip(base).forall { case ((tf, th), (bf, bh)) =>
            tf == bf && (if (tf == 0) th != bh else th == bh)
          }
    }

  property("video container sampling decodes exactly the step-th frames") =
    forAll(genVideo) { case (id, nf, step) =>
      val frames = VideoCodec
        .sampleFrames(Asset(id, "video/x-graft-frames", VideoCodec.videoBytes(id, nf), "prop"), step)
        .toSeq
      frames.map(_.frame_idx) == (0 until nf by step) &&
        frames.forall { f =>
          f.width == 8 + (id % 16).toInt &&
            f.height == 8 + f.frame_idx % 8 &&
            f.px00 == ((id + f.frame_idx * 13) % 256).toInt
        }
    }
}
