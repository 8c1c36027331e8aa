// Round-11 probe, part 2: ONE MILLION tiny .wsp files - the full
// graphite-tree regime, after the memoized-Configuration fix
// (scale_check11_files.scala measured 1k/10k/100k). Files are nested
// dir/sub/metric.wsp two levels deep (1000 dirs x 1000 files) exactly like
// a real graphite tree, so this also exercises the recursive directory
// expansion path (WhisperIO.expand listFiles(recursive)).
import graft.format.WhisperWriter
import scala.collection.parallel.CollectionConverters._

val base = java.nio.file.Paths.get("/tmp/wsp_scale11_1m")
val N = 1000000
if (!java.nio.file.Files.isDirectory(base.resolve("d999"))) {
  val t0 = System.nanoTime()
  (0 until 1000).par.foreach { d =>
    val dir = base.resolve(f"d$d%03d")
    java.nio.file.Files.createDirectories(dir)
    (0 until 1000).foreach { i =>
      WhisperWriter.writeFile(dir.resolve(f"m$i%03d.wsp"), WhisperWriter.FileSpec(
        archives = Seq(WhisperWriter.ArchiveSpec(
          secondsPerPoint = 60, points = 100, filled = 100,
          lastTimestamp = 6000, rotation = (d + i) % 100))))
    }
  }
  println(f"MARKER_gen wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
}

val walls = (1 to 2).map { _ =>
  val t0 = System.nanoTime()
  val df = spark.read.format("whisper").load(base.toString) // directory: recursive expansion
  val rows = df.count()
  val parts = df.rdd.getNumPartitions
  val w = (System.nanoTime() - t0) / 1e9
  assert(rows == 100L * N, s"expected ${100L * N} rows, got $rows")
  (w, parts)
}
println(f"MARKER_1m first=${walls(0)._1}%.1f second=${walls(1)._1}%.1f parts=${walls(0)._2}")

// column-pruned + pushed-filter pass over the same tree: the metadata-only
// query pattern (count filled points since t) a graphite UI would issue
val t0 = System.nanoTime()
val n = spark.read.format("whisper").load(base.toString)
  .where(org.apache.spark.sql.functions.col("timestamp") >=
    java.sql.Timestamp.valueOf("1970-01-01 00:50:00"))
  .select("value").count()
println(f"MARKER_1m_filtered rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f")
sys.exit(0)
