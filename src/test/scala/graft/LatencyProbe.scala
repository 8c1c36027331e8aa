package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.SparkSession

import graft.format.WhisperWriter
import graft.format.WhisperWriter.{ArchiveSpec, FileSpec}
import graft.sources.whisper.WhisperManifest

/**
 * Measurement harness for the remote-storage planning envelope
 * (VERDICT r11 #1): times whisper planning over a [[SlowFs]] tree at
 * object-store-class per-operation latencies, direct vs manifest-backed,
 * and the sharded streaming walk. Results land in BENCH_NOTES r12.
 *
 * Run: sbt "Test/runMain graft.LatencyProbe [nFiles...]"
 */
object LatencyProbe {
  private def mkTree(nDirs: Int, filesPerDir: Int): JPath = {
    val tree = Files.createTempDirectory("latprobe")
    val spec = FileSpec(archives = Seq(
      ArchiveSpec(10, 120, filled = 60, lastTimestamp = 1600000000L, rotation = 7)))
    for (d <- 0 until nDirs) {
      val sub = tree.resolve(s"svc$d")
      Files.createDirectories(sub)
      for (f <- 0 until filesPerDir) WhisperWriter.writeFile(sub.resolve(s"m$f.wsp"), spec)
    }
    tree
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1000, 10000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("latency-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.slowfs.impl", classOf[SlowFs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def planWall(pattern: String, opts: Map[String, String]): (Double, Long, Long, Long) = {
      SlowFs.reset(SlowFs.latencyMs)
      val t0 = System.nanoTime()
      val r = opts.foldLeft(spark.read.format("whisper")) { case (a, (k, v)) => a.option(k, v) }
      r.load(pattern).rdd.getNumPartitions
      ((System.nanoTime() - t0) / 1e9, SlowFs.opens.get(), SlowFs.stats.get(), SlowFs.lists.get())
    }

    println("files | latency_ms | mode | wall_s | opens | stats | lists")
    for (n <- sizes) {
      val dirs = math.max(1, n / 100)
      val tree = mkTree(dirs, n / dirs)
      val pat = "slowfs:" + tree.toAbsolutePath + "/*"
      // JIT warm at zero latency (one-off per JVM, invariant in file count)
      SlowFs.latencyMs = 0
      planWall(pat, Map.empty)
      val manifest = Files.createTempDirectory("latprobe-m").resolve("m.jsonl.gz").toString
      WhisperManifest.write(Seq(pat), manifest)
      for (lat <- Seq(0L, 10L, 50L)) {
        SlowFs.latencyMs = lat
        val (w1, o1, s1, l1) = planWall(pat, Map.empty)
        println(f"$n%6d | $lat%3d | direct   | $w1%8.2f | $o1%6d | $s1%6d | $l1%5d")
        val (w2, o2, s2, l2) = planWall(pat, Map("headerManifest" -> manifest))
        println(f"$n%6d | $lat%3d | manifest | $w2%8.2f | $o2%6d | $s2%6d | $l2%5d")
        val (w3, o3, s3, l3) = planWall(pat.stripSuffix("/*"), Map("streamShard" -> "0/4"))
        println(f"$n%6d | $lat%3d | shard1/4 | $w3%8.2f | $o3%6d | $s3%6d | $l3%5d")
      }
      // serial reference point at the small size only (it is the slow case)
      if (n <= 1000) {
        SlowFs.latencyMs = 10
        val (w, o, s, l) = planWall(pat, Map("planningParallelism" -> "1"))
        println(f"$n%6d |  10 | serial   | $w%8.2f | $o%6d | $s%6d | $l%5d")
      }
    }
    spark.stop()
  }
}
