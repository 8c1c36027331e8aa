// Round-12 probe: the 1M-file regime for the round's two new scale paths.
//  1. Streaming steady-state floor, full tree vs streamShard 1/4: the r11
//     floor (11-31 s/trigger at 1M files) is the directory walk; sharding
//     divides the walk itself, so each of n streams should pay ~1/n.
//  2. Incremental export: full export once, then 1000 files get new points
//     and exportDelta (watermark + mtimeSlop pruning) ships only those --
//     delta wall vs the full-rescan wall is the feature's value.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check12_1m.scala
import org.apache.spark.sql.streaming.Trigger
import scala.collection.parallel.CollectionConverters._
import graft.format.WhisperWriter

val base = java.nio.file.Paths.get("/tmp/wsp_scale12_1m")
val mtIdle = java.nio.file.attribute.FileTime.from(java.time.Instant.ofEpochSecond(5000))
if (!java.nio.file.Files.isDirectory(base.resolve("d999"))) {
  val t0 = System.nanoTime()
  (0 until 1000).par.foreach { d =>
    val dir = base.resolve(f"d$d%03d")
    java.nio.file.Files.createDirectories(dir)
    (0 until 1000).foreach { i =>
      val p = dir.resolve(f"m$i%03d.wsp")
      WhisperWriter.writeFile(p, WhisperWriter.FileSpec(
        archives = Seq(WhisperWriter.ArchiveSpec(
          secondsPerPoint = 60, points = 100, filled = 100,
          lastTimestamp = 6000, rotation = (d + i) % 100))))
      java.nio.file.Files.setLastModifiedTime(p, mtIdle)
    }
  }
  println(f"MARKER_gen wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
}

// --- 0. batch planning baseline with the r12 parallel walk ---
val tw0 = System.nanoTime()
val dfAll = spark.read.format("whisper").load(base.toString)
val partsAll = dfAll.rdd.getNumPartitions
println(f"MARKER_batch_plan wall=${(System.nanoTime() - tw0) / 1e9}%.1f parts=$partsAll")

// --- 1. streaming steady-state floor: full vs shard 1/4 ---
def streamFloor(tag: String, opts: Map[String, String]): Unit = {
  val r0 = spark.readStream.format("whisper").option("streamMtimeSlop", "3600")
  val r = opts.foldLeft(r0) { case (a, (k, v)) => a.option(k, v) }
  val q = r.load(base.toString)
    .writeStream.format("noop").trigger(Trigger.ProcessingTime("1 second")).start()
  val deadline = System.nanoTime() + 240L * 1000000000L
  while (System.nanoTime() < deadline && q.recentProgress.length < 4) Thread.sleep(500)
  q.stop(); q.awaitTermination(30000)
  q.recentProgress.take(4).zipWithIndex.foreach { case (p, i) =>
    println(s"MARKER_${tag}_batch$i trigger_ms=${p.durationMs.get("triggerExecution")} " +
      s"latestOffset_ms=${p.durationMs.get("latestOffset")} rows=${p.numInputRows}")
  }
}
streamFloor("full", Map.empty)
streamFloor("shard", Map("streamShard" -> "0/4"))

// --- 2. incremental export ---
val out = "/tmp/wsp_scale12_export"
org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
val tFull = System.nanoTime()
val nFull = graft.Main.exportFull(spark, base.toString, out, Some(16), untilTs = 6000L)
println(f"MARKER_export_full rows=$nFull wall=${(System.nanoTime() - tFull) / 1e9}%.1f")

// today's writes: 1000 files (one per dir) get a fresh ring ending at 12000
(0 until 1000).par.foreach { d =>
  WhisperWriter.writeFile(base.resolve(f"d$d%03d").resolve("m000.wsp"),
    WhisperWriter.FileSpec(archives = Seq(WhisperWriter.ArchiveSpec(
      secondsPerPoint = 60, points = 100, filled = 100,
      lastTimestamp = 12000, rotation = d % 100))))
}
val tDelta = System.nanoTime()
val nDelta = graft.Main.exportDelta(spark, base.toString, out, Some(4),
  untilTs = 12000L, mtimeSlop = 500L)
println(f"MARKER_export_delta rows=$nDelta wall=${(System.nanoTime() - tDelta) / 1e9}%.1f")
// value check: the dataset now holds full + delta windows, exactly once each
val total = spark.read.parquet(out).count()
println(s"MARKER_export_total rows=$total expect=${nFull + nDelta}")
sys.exit(0)
