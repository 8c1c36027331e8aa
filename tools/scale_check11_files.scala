// Round-11 probe (VERDICT r10 #4): driver-side header planning wall at
// extreme file counts. A graphite tree is millions of .wsp files; planning
// reads 16 + 12N bytes per file on the driver (parallel collection,
// WhisperScan.unitPartitions). Bin-packing was probed at 2,000 files
// (scale_check8d); this times plan + first action at 1k / 10k / 100k files.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --jars <jar> \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        -i tools/scale_check11_files.scala
import graft.format.WhisperWriter
import scala.collection.parallel.CollectionConverters._

val base = java.nio.file.Paths.get("/tmp/wsp_scale11")
def gen(n: Int): String = {
  val dir = base.resolve(s"n$n")
  if (!java.nio.file.Files.isDirectory(dir) ||
      java.nio.file.Files.list(dir).count() != n) {
    java.nio.file.Files.createDirectories(dir)
    val t0 = System.nanoTime()
    // 100-point single-archive files (1,228 bytes each): the many-tiny-files
    // regime where planning cost is per-file open/seek latency, not bytes
    (0 until n).par.foreach { i =>
      WhisperWriter.writeFile(dir.resolve(f"m$i%06d.wsp"), WhisperWriter.FileSpec(
        archives = Seq(WhisperWriter.ArchiveSpec(
          secondsPerPoint = 60, points = 100, filled = 100,
          lastTimestamp = 6000, rotation = i % 100))))
    }
    println(f"MARKER_gen n=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
  dir.toString
}

def probe(n: Int): Unit = {
  val dir = gen(n)
  // cold-ish: fresh reader each run; min of 2 post-warm runs (JIT)
  val walls = (1 to 3).map { _ =>
    val t0 = System.nanoTime()
    val df = spark.read.format("whisper").load(s"$dir/*.wsp")
    val rows = df.count()
    val parts = df.rdd.getNumPartitions
    val w = (System.nanoTime() - t0) / 1e9
    assert(rows == 100L * n, s"expected ${100L * n} rows, got $rows")
    (w, parts)
  }
  val best = walls.drop(1).map(_._1).min
  println(f"MARKER_plan n=$n%6d first=${walls.head._1}%.2f min_warm=$best%.2f parts=${walls.head._2}")
}

probe(1000)
probe(10000)
probe(100000)
sys.exit(0)
