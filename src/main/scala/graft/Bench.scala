package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions) // native functions + whisper plan rules
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/JIT + parquet footer caches so per-query numbers measure
    // the queries, not first-touch costs.
    try SparkEntry.queries.get("q01_tpch1_agg").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    // Steady-state latency: first execution per query pays one-off
    // whole-stage-codegen compilation (~1s/query, invariant in data size);
    // the timed second run measures the actual data-dependent work.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // a crashing query must surface as a failure, not as its (fast)
      // time-to-exception: report -1 and list it under "errors"
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // intra-query caches must not tax the next query
      (name, if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // Reference-scale whisper throughput: BASELINE.md's only concrete scale
    // facts are the 82,785,664-byte 3-archive example file (6,898,801 points,
    // 1,555,200/2,331,015/38,855 filled). Synthesize that exact shape once,
    // then time a warm full read+decode+order+aggregate — the reference's
    // whole `to_frame()` workload — so every BENCH round carries a direct
    // single-node comparison point against the reference's eager numpy read.
    val whisper = try {
      import graft.format.WhisperWriter._
      val p = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_bench_ref.wsp")
      if (!java.nio.file.Files.exists(p) || java.nio.file.Files.size(p) != 82785664L) {
        val t0 = 1700000000L
        writeFile(p, FileSpec(archives = Seq(
          ArchiveSpec(10L, 1555200L, 1555200L, t0 - t0 % 10, 123457L),
          ArchiveSpec(60L, 5256000L, 2331015L, t0 - t0 % 60, 987654L),
          ArchiveSpec(3600L, 87601L, 38855L, t0 - t0 % 3600, 7701L))))
      }
      def scan() = spark.read.format("whisper").load(p.toString)
        .groupBy("archive").count().collect()
      scan() // warm (codegen + file cache)
      val t0n = System.nanoTime()
      val rows = scan().map(_.getLong(1)).sum
      val dt = (System.nanoTime() - t0n) / 1e9
      s""","whisper_ref_scan_sec":$dt,"whisper_ref_rows":$rows"""
    } catch { case _: Throwable => "" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs$whisper,"sf":"$sfDir"}""")
    spark.stop()
  }
}
