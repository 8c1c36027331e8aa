package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.format.WhisperCodec.FileMeta
import graft.sources.whisper.WhisperIO

/**
 * Driver-side metadata introspection — the reference's `describe_meta` /
 * `describe_archives` / `print_info` surface (`whisper_pandas.py:147-168`).
 * Metadata is header-only and tiny, so these are plain case classes turned
 * into DataFrames on the driver; no executor work.
 */
object WhisperMeta {

  final case class ArchiveRow(
      archive: Int,
      seconds_per_point: Long,
      points: Long,
      retention: Long,
      offset: Long,
      size: Long
  )

  final case class FileRow(
      path: String,
      file_size_actual: Long,
      file_size_expected: Long,
      aggregation_method: String,
      max_retention: Long,
      x_files_factor: Float,
      file_size_mismatch: Boolean
  )

  /** Header-only read (gzip-aware by suffix, `whisper_pandas.py:257-261`). */
  def read(path: String): FileMeta = WhisperIO.readMeta(path, path.endsWith(".gz"))

  /** `describe_meta()` parity (`whisper_pandas.py:147-157`). */
  def describeMeta(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val m = read(path)
    Seq(FileRow(
      m.path, m.fileSizeActual, m.fileSizeExpected, m.aggregationMethod,
      m.maxRetention, m.xFilesFactor, m.fileSizeMismatch
    )).toDF()
  }

  /** `describe_archives()` parity (`whisper_pandas.py:159-163`). */
  def describeArchives(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val m = read(path)
    m.archives.map(a => ArchiveRow(a.index, a.secondsPerPoint, a.points, a.retention, a.offset, a.size)).toDF()
  }

  /** `print_info()` parity (`whisper_pandas.py:165-168`). */
  def printInfo(spark: SparkSession, path: String): Unit = {
    println("Whisper file metadata")
    describeMeta(spark, path).show(truncate = false)
    println("Whisper archives")
    describeArchives(spark, path).show(truncate = false)
  }
}
