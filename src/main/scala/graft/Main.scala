package graft

import org.apache.spark.sql.SparkSession

import graft.meta.WhisperMeta

/** CLI. Three modes:
 *
 *  - `graft.Main <path.wsp[.gz]> [more paths...]` — parity with the
 *    reference's console script (`whisper_pandas.py:288-296`,
 *    `setup.cfg:19-21`): print file + archive metadata per Whisper path.
 *    Driver-only; no executors needed.
 *  - `graft.Main curate <tables-dir> <out-dir>` — run the flagship curation
 *    pipeline (quality gate → near-dup removal → language ID, one Catalyst
 *    plan) over `<tables-dir>/documents.parquet` and write the surviving
 *    corpus to `<out-dir>` as parquet. The operator library as a tool.
 *  - `graft.Main export <tree-or-glob> <out-dir>` — bulk whisper → parquet
 *    migration (the reference leaves writing "TBD",
 *    `whisper_pandas.ipynb:1382`; the lake-migration direction is the one
 *    users actually need). Reads the whole tree through the DSv2 scan
 *    (header-only planning, bin-packed small files) and writes one
 *    parquet dataset with the full native schema; row-group locality by
 *    metric comes from the scan's file-major partition order, NOT a
 *    partitionBy("file") — a million metrics must not become a million
 *    output directories.
 */
object Main {
  private val Usage =
    """usage: graft.Main <path.wsp[.gz]> [more paths...]
      |       graft.Main curate <tables-dir> <out-dir>
      |       graft.Main export <tree-or-glob> <out-dir> [targetPartitions]
      |       graft.Main export-delta <tree-or-glob> <out-dir> [targetPartitions] [mtimeSlopSeconds]
      |       graft.Main manifest <tree-or-glob> <out.jsonl[.gz]>""".stripMargin

  /** The `export` mode's pipeline (spec-driven at the library level):
   * whisper tree → ONE parquet dataset; returns the exported row count.
   *
   * `targetPartitions = None` mirrors the scan's bin-packed partitions —
   * correct but one (small) parquet file per scan task (a 1M-file tree
   * wrote 3,908 x ~24 KB files, recreating the small-files problem on the
   * lake side). `Some(n)`: repartitionByRange(file, timestamp) + a
   * within-partition sort buys metric-major clustering, long RLE runs,
   * and a user-chosen file count for one extra shuffle — the right trade
   * for a one-time migration.
   *
   * A compacted partition holds ~tree_size/n distinct metric paths; past
   * ~25k of them the `file` column's dictionary outgrows parquet's default
   * 1 MB dictionary-page cap and silently falls back to PLAIN — measured
   * 125 MB of a 157 MB export where the dictionary form is ~0.1 MB
   * (BENCH_NOTES r11). A path dictionary is the point of this column;
   * give it room.
   *
   * Incremental form (VERDICT r11 #4): `(sinceTs, untilTs]` bounds the
   * exported TIME WINDOW — the same timestamp-watermark contract the
   * streaming tail's offsets use, so daily delta runs ship only new points
   * instead of rescanning 100 TB. Window predicates push into the whisper
   * scan (slot pruning during decode); `append = true` adds the increment
   * to the existing dataset directory, whose union with the base is then
   * exactly the full export (round-trip spec). `mtimeFloor >= 0`
   * additionally skips files idle since before it at PLAN time — opt-in,
   * same write-behind assumptions as `streamMtimeSlop` (a delta over a
   * mostly-idle million-file tree otherwise still pays a header read per
   * file). */
  private[graft] def exportTree(
      spark: SparkSession,
      tree: String,
      out: String,
      targetPartitions: Option[Int],
      sinceTs: Long = Long.MinValue,
      untilTs: Long = Long.MaxValue,
      append: Boolean = false,
      mtimeFloor: Long = -1L): Long = {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val reader = spark.read.format("whisper")
    val df0 =
      (if (mtimeFloor >= 0) reader.option("mtimeFloor", mtimeFloor.toString) else reader)
        .load(tree)
    // each bound applied independently: timestamp_seconds(Long.MinValue)
    // overflows the micros representation, so an unbounded side means NO
    // predicate, not a sentinel comparison
    def windowed(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val lo = if (sinceTs == Long.MinValue) d
        else d.filter(col("timestamp") > timestamp_seconds(org.apache.spark.sql.functions.lit(sinceTs)))
      if (untilTs == Long.MaxValue) lo
      else lo.filter(col("timestamp") <= timestamp_seconds(org.apache.spark.sql.functions.lit(untilTs)))
    }
    val df = windowed(df0)
    val shaped = targetPartitions match {
      case Some(n) =>
        df.repartitionByRange(n, col("file"), col("timestamp"))
          .sortWithinPartitions("file", "archive", "timestamp")
      case None => df
    }
    shaped.write.mode(if (append) "append" else "overwrite")
      .option("parquet.dictionary.page.size", 64L * 1024 * 1024)
      .parquet(out)
    // returned count = THIS run's window, read back from the lake side (a
    // pushed-predicate parquet count): the whisper tree is scanned exactly
    // once per export, which is the whole point of the delta path
    windowed(spark.read.parquet(out)).count()
  }

  /** Export watermark: the upper time bound the dataset at `out` covers,
   * kept in an underscore-prefixed JSON file parquet readers ignore. The
   * watermark is wall-clock "now" at export start (the streaming tail's
   * offset model: a slot for time T is final once T has passed), so
   * `exportDelta` resumes exactly where the last run's window ended. */
  private val WatermarkFile = "_graft_export_watermark.json"

  def readWatermark(spark: SparkSession, out: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(out, WatermarkFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try {
        in.readFully(0L, buf)
        val txt = new String(buf, "UTF-8")
        Some(""""until_ts":\s*(-?\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          .getOrElse(sys.error(s"malformed export watermark at $p: $txt")))
      } finally in.close()
    }
  }

  def writeWatermark(spark: SparkSession, out: String, untilTs: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(out, WatermarkFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val o = fs.create(p, true)
    try o.write(s"""{"until_ts": $untilTs}""".getBytes("UTF-8")) finally o.close()
  }

  /** Full export + watermark: the base a later [[exportDelta]] resumes from. */
  def exportFull(
      spark: SparkSession,
      tree: String,
      out: String,
      targetPartitions: Option[Int],
      untilTs: Long): Long = {
    val n = exportTree(spark, tree, out, targetPartitions, untilTs = untilTs)
    writeWatermark(spark, out, untilTs)
    n
  }

  /** Watermark-resumable delta: appends points in (last watermark, untilTs]
   * to the dataset and advances the watermark. `mtimeSlop >= 0` opts in to
   * idle-file pruning at `watermark - slop` (the streamMtimeSlop contract).
   * Returns the appended row count.
   *
   * Failure semantics: the parquet append commits atomically (Spark's file
   * committer publishes only on job commit), and the watermark advances
   * AFTER it — so a crash before commit loses nothing and a rerun covers
   * the same window, while a crash in the sliver between commit and
   * watermark write duplicates that window on rerun. Duplicates are
   * detectable (same (file, archive, position, timestamp) keys) and the
   * window is user-chosen, so the recovery is `DELETE` of the window +
   * rerun; exactly-once would need a lake format with transactional
   * manifests (Delta/Iceberg), which the plain-parquet target forgoes. */
  def exportDelta(
      spark: SparkSession,
      tree: String,
      out: String,
      targetPartitions: Option[Int],
      untilTs: Long,
      mtimeSlop: Long = -1L): Long = {
    val since = readWatermark(spark, out).getOrElse(
      sys.error(s"no export watermark at $out — run a full export first"))
    require(untilTs >= since, s"untilTs $untilTs precedes the watermark $since")
    val n = exportTree(spark, tree, out, targetPartitions,
      sinceTs = since, untilTs = untilTs, append = true,
      mtimeFloor = if (mtimeSlop >= 0) since - mtimeSlop else -1L)
    writeWatermark(spark, out, untilTs)
    n
  }

  private def session(app: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName(app)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("curate", dir, out) =>
      val spark = session("graft-curate")
      try {
        val kept = operators.CurationPipeline.curate(spark, dir)
        kept.write.mode("overwrite").parquet(out)
        println(s"curated ${spark.read.parquet(out).count()} surviving docs -> $out")
      } finally spark.stop()
    case Seq("manifest", tree, out) =>
      // Header manifest for plan-time reuse ([[sources.whisper.WhisperManifest]]):
      // driver-only — the walk + concurrent header sweep need no executors.
      // Readers opt in with .option("headerManifest", out).
      val n = sources.whisper.WhisperManifest.write(Seq(tree), out)
      println(s"manifested $n whisper headers -> $out")
    case Seq("export", tree, out, rest @ _*) if rest.length <= 1 =>
      val spark = session("graft-export")
      try {
        // watermark = "now" at export start (write-behind model: a slot for
        // time T is final once T passed), the point export-delta resumes from
        val n = exportFull(spark, tree, out, rest.headOption.map(_.toInt),
          untilTs = System.currentTimeMillis() / 1000L)
        println(s"exported $n points -> $out")
      } finally spark.stop()
    case Seq("export-delta", tree, out, rest @ _*) if rest.length <= 2 =>
      val spark = session("graft-export-delta")
      try {
        val n = exportDelta(spark, tree, out,
          rest.headOption.map(_.toInt),
          untilTs = System.currentTimeMillis() / 1000L,
          mtimeSlop = rest.lift(1).map(_.toLong).getOrElse(-1L))
        println(s"appended $n points -> $out")
      } finally spark.stop()
    case paths if paths.nonEmpty && !Seq("curate", "export", "export-delta", "manifest").contains(paths.head) =>
      val spark = session("whisper-info")
      try paths.foreach(WhisperMeta.printInfo(spark, _))
      finally spark.stop()
    case _ =>
      System.err.println(Usage)
      sys.exit(2)
  }
}
