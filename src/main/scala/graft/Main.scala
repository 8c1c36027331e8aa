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
      |       graft.Main export <tree-or-glob> <out-dir>""".stripMargin

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
    case Seq("export", tree, out) =>
      val spark = session("graft-export")
      try {
        val df = spark.read.format("whisper").load(tree)
        df.write.mode("overwrite").parquet(out)
        val n = spark.read.parquet(out).count()
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
