package graft

import org.apache.spark.sql.SparkSession

import graft.meta.WhisperMeta

/** CLI parity with the reference's console script
 * (`whisper_pandas.py:288-296`, `setup.cfg:19-21`): print file + archive
 * metadata for each given Whisper path. Driver-only; no executors needed. */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.Main <path.wsp[.gz]> [more paths...]")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("whisper-info")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.foreach(WhisperMeta.printInfo(spark, _))
    finally spark.stop()
  }
}
