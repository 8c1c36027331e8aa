package graft

import java.io.ByteArrayOutputStream

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.format.{WhisperCodec, WhisperWriter}
import graft.format.WhisperWriter.{ArchiveSpec, FileSpec}

/** Property tests for the binary codec (SURVEY §5 port plan: properties the
 * reference lacks — write-fixture -> read roundtrip, filter counts, rotation
 * order — over randomized archive shapes). Pure JVM, no Spark session. */
object WhisperCodecProps extends Properties("WhisperCodec") {

  private val genArchive: Gen[ArchiveSpec] = for {
    spp <- Gen.oneOf(1L, 10L, 60L, 3600L)
    points <- Gen.chooseNum(1L, 2000L)
    filled <- Gen.chooseNum(0L, points)
    rotation <- Gen.chooseNum(0L, points - 1)
    // keep all generated timestamps strictly positive (> points * spp)
    lastTs <- Gen.chooseNum(10000000L, 2000000000L)
  } yield ArchiveSpec(spp, points, filled, lastTs - lastTs % spp, rotation)

  private val genFile: Gen[FileSpec] = for {
    method <- Gen.oneOf(WhisperCodec.AggregationMethods.values.toSeq)
    xff <- Gen.chooseNum(0.0f, 1.0f)
    archives <- Gen.nonEmptyListOf(genArchive).map(_.take(5))
  } yield FileSpec(method, xff, archives)

  private def writeBytes(spec: FileSpec): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    WhisperWriter.write(bos, spec)
    bos.toByteArray
  }

  property("header roundtrip: meta parses back exactly") = forAll(genFile) { spec =>
    val bytes = writeBytes(spec)
    val meta = WhisperCodec.parseMeta(bytes, "mem", bytes.length.toLong)
    (meta.aggregationMethod == spec.aggregationMethod) :| "aggregation" &&
    (math.abs(meta.xFilesFactor - spec.xFilesFactor) < 1e-6f) :| "xff" &&
    (meta.archives.size == spec.archives.size) :| "count" &&
    (meta.fileSizeExpected == bytes.length.toLong) :| "size arithmetic" &&
    (!meta.fileSizeMismatch) :| "no mismatch" &&
    meta.archives.zip(spec.archives).forall { case (m, s) =>
      m.secondsPerPoint == s.secondsPerPoint && m.points == s.points
    } :| "archive metas"
  }

  property("point decode: filled-slot count and values roundtrip") = forAll(genFile) { spec =>
    val bytes = writeBytes(spec)
    val meta = WhisperCodec.parseMeta(bytes, "mem", bytes.length.toLong)
    Prop.all(meta.archives.zip(spec.archives).map { case (m, s) =>
      val pts = WhisperCodec.decodePoints(bytes, m.offset.toInt, m.points.toInt, 0L)
      val filled = pts.filter(_.timestamp != 0L)
      (pts.length.toLong == s.points) :| s"capacity a${m.index}" &&
      (filled.length.toLong == s.filled || s.lastTimestamp == 0) :| s"filled a${m.index}" &&
      filled.forall(p => math.abs(p.value - s.value(p.position)) < 1e-9) :| s"values a${m.index}"
    }: _*)
  }

  property("rotation: sorted-by-timestamp equals rotated physical order") = forAll(genFile) { spec =>
    val bytes = writeBytes(spec)
    val meta = WhisperCodec.parseMeta(bytes, "mem", bytes.length.toLong)
    Prop.all(meta.archives.map { m =>
      val filled = WhisperCodec.decodePoints(bytes, m.offset.toInt, m.points.toInt, 0L)
        .filter(_.timestamp != 0L)
      val sortedTs = filled.map(_.timestamp).sorted.toSeq
      // at most 2 ascending runs -> rotating at the minimum restores order
      val byRotation =
        if (filled.isEmpty) Seq.empty[Long]
        else {
          val minIdx = filled.indices.minBy(i => filled(i).timestamp)
          (filled.drop(minIdx) ++ filled.take(minIdx)).map(_.timestamp).toSeq
        }
      (byRotation == sortedTs) :| s"rotation a${m.index}"
    }: _*)
  }

  property("truncation: readMeta + streamPoints stop cleanly at EOF") = forAll(genFile, Gen.chooseNum(16, 4096)) {
    (spec, keep) =>
      val bytes = writeBytes(spec)
      val cut = bytes.take(math.max(keep, 16 + 12 * spec.archives.size))
      val meta = WhisperCodec.parseMeta(cut, "mem", cut.length.toLong)
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(cut))
      in.skipBytes(meta.headerSize.toInt)
      val first = meta.archives.head
      val n = WhisperCodec.streamPoints(in, first.points)((_, _, _) => ())
      (meta.archives.size == spec.archives.size) :| "headers parse" &&
      (n <= first.points) :| "no overrun" &&
      (meta.fileSizeMismatch == (cut.length != bytes.length)) :| "mismatch flag"
  }
}
