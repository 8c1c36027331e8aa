package graft.format

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

/**
 * Test-fixture synthesizer for Whisper files.
 *
 * The reference defers writing entirely (`whisper_pandas.ipynb:1382` "TBD") and
 * its large binary fixtures are stripped from the clone
 * (`/root/reference/.MISSING_LARGE_BLOBS`), so our test suite synthesizes its
 * own files with the documented layout (`whisper_pandas.py:20-31`). This writer
 * exists ONLY to produce fixtures — the engine never writes Whisper data.
 */
object WhisperWriter {

  /** A single archive to synthesize: fixed capacity ring buffer, with `filled`
   * slots populated ending at `lastTimestamp` (aligned to secondsPerPoint), and
   * the ring rotated so the oldest filled point sits at physical position
   * `rotation`. Remaining slots carry timestamp 0 (never-filled). */
  final case class ArchiveSpec(
      secondsPerPoint: Long,
      points: Long,
      filled: Long,
      lastTimestamp: Long,
      rotation: Long,
      value: Long => Double = p => math.sin(p.toDouble / 10.0) * 100.0
  ) {
    require(filled <= points, "filled slots cannot exceed capacity")
    require(rotation >= 0 && rotation < math.max(points, 1), "rotation out of range")
    def retention: Long = secondsPerPoint * points
  }

  final case class FileSpec(
      aggregationMethod: String = "average",
      xFilesFactor: Float = 0.5f,
      archives: Seq[ArchiveSpec]
  )

  /** Write `spec` to `out`; returns the expected (uncompressed) byte size. */
  def write(out: OutputStream, spec: FileSpec): Long = {
    val n = spec.archives.size
    val headerSize = WhisperCodec.FileMetaSize + WhisperCodec.ArchiveMetaSize * n
    val maxRetention = if (spec.archives.isEmpty) 0L else spec.archives.map(_.retention).max
    val head = ByteBuffer.allocate(headerSize) // big-endian
    head.putInt(WhisperCodec.AggregationTypes(spec.aggregationMethod))
    head.putInt(maxRetention.toInt)
    head.putFloat(spec.xFilesFactor)
    head.putInt(n)
    var offset = headerSize.toLong
    spec.archives.foreach { a =>
      head.putInt(offset.toInt)
      head.putInt(a.secondsPerPoint.toInt)
      head.putInt(a.points.toInt)
      offset += a.points * WhisperCodec.PointSize
    }
    out.write(head.array())

    spec.archives.foreach { a =>
      // Logical slot k (k = 0 oldest .. filled-1 newest) has
      //   timestamp = lastTimestamp - (filled-1-k)*spp
      // and lives at physical position (rotation + k) mod points. Slots not
      // covered by any k are unfilled (timestamp 0) — mirrors the rotated ring
      // the reference exposes (notebook cell 16, golden indices
      // test_whisper_pandas.py:47-50).
      val buf = ByteBuffer.allocate(WhisperCodec.PointSize)
      val tsAt = new Array[Long](a.points.toInt)
      val vAt = new Array[Double](a.points.toInt)
      var k = 0L
      while (k < a.filled) {
        val pos = ((a.rotation + k) % a.points).toInt
        tsAt(pos) = a.lastTimestamp - (a.filled - 1 - k) * a.secondsPerPoint
        vAt(pos) = a.value(pos.toLong)
        k += 1
      }
      var p = 0
      while (p < a.points) {
        buf.clear()
        buf.putInt(tsAt(p).toInt)
        buf.putDouble(vAt(p))
        out.write(buf.array())
        p += 1
      }
    }
    offset
  }

  /** Write to a file path; gzip-compresses when the path ends in `.gz`
   * (mirrors the reference's suffix-based compression inference,
   * `whisper_pandas.py:257-261`). */
  def writeFile(path: Path, spec: FileSpec): Long = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    val raw = new BufferedOutputStream(new FileOutputStream(path.toFile))
    val out = if (path.toString.endsWith(".gz")) new GZIPOutputStream(raw) else raw
    try write(out, spec)
    finally out.close()
  }

  /** Truncate an existing file to its first `keep` bytes (fixture recipe for
   * the corrupt-input test, `/root/reference/data/README.md:13-21`). */
  def truncateCopy(src: Path, dst: Path, keep: Int): Unit = {
    val bytes = Files.readAllBytes(src)
    Files.write(dst, bytes.take(keep))
  }
}
