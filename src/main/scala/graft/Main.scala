package graft

import org.apache.spark.sql.SparkSession

import graft.meta.WhisperMeta

/** CLI. Two modes:
 *
 *  - `graft.Main <path.wsp[.gz]> [more paths...]` — parity with the
 *    reference's console script (`whisper_pandas.py:288-296`,
 *    `setup.cfg:19-21`): print file + archive metadata per Whisper path.
 *    Driver-only; no executors needed.
 *  - `graft.Main curate <tables-dir> <out-dir>` — run the flagship curation
 *    pipeline (quality gate → near-dup removal → language ID, one Catalyst
 *    plan) over `<tables-dir>/documents.parquet` and write the surviving
 *    corpus to `<out-dir>` as parquet. The operator library as a tool.
 */
object Main {
  private val Usage =
    """usage: graft.Main <path.wsp[.gz]> [more paths...]
      |       graft.Main curate <tables-dir> <out-dir>""".stripMargin

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
    case paths if paths.nonEmpty && paths.head != "curate" =>
      val spark = session("whisper-info")
      try paths.foreach(WhisperMeta.printInfo(spark, _))
      finally spark.stop()
    case _ =>
      System.err.println(Usage)
      sys.exit(2)
  }
}
