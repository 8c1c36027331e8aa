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
      |       graft.Main export <tree-or-glob> <out-dir> [targetPartitions]""".stripMargin

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
   * give it room. */
  private[graft] def exportTree(
      spark: SparkSession,
      tree: String,
      out: String,
      targetPartitions: Option[Int]): Long = {
    val df = spark.read.format("whisper").load(tree)
    val shaped = targetPartitions match {
      case Some(n) =>
        import org.apache.spark.sql.functions.col
        df.repartitionByRange(n, col("file"), col("timestamp"))
          .sortWithinPartitions("file", "archive", "timestamp")
      case None => df
    }
    shaped.write.mode("overwrite")
      .option("parquet.dictionary.page.size", 64L * 1024 * 1024)
      .parquet(out)
    spark.read.parquet(out).count()
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
    case Seq("export", tree, out, rest @ _*) if rest.length <= 1 =>
      val spark = session("graft-export")
      try {
        val n = exportTree(spark, tree, out, rest.headOption.map(_.toInt))
        println(s"exported $n points -> $out")
      } finally spark.stop()
    case paths if paths.nonEmpty && paths.head != "curate" && paths.head != "export" =>
      val spark = session("whisper-info")
      try paths.foreach(WhisperMeta.printInfo(spark, _))
      finally spark.stop()
    case _ =>
      System.err.println(Usage)
      sys.exit(2)
  }
}
