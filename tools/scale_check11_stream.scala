// Round-11 probe, part 3: per-TRIGGER planning cost of the streaming tail
// over a 100k-file tree (tools/scale_check11_files.scala generated it).
// With a live clock every trigger has hi > lo, so planInputPartitions runs
// per trigger even with zero new points - the pure planning floor. The
// header-metadata cache makes batch 0 pay the 100k header reads once;
// batches 1+ should drop to the directory-walk + bin-pack cost.
import org.apache.spark.sql.streaming.Trigger
import scala.collection.parallel.CollectionConverters._

val dir = "/tmp/wsp_scale11/n100000"
// make the fixture look like a real idle graphite tree: each file's mtime
// matches its last written point (ts <= 6000), not generation time - the
// plan-time idle pruning keys on it
val d = java.nio.file.Paths.get(dir)
val mt = java.nio.file.attribute.FileTime.from(java.time.Instant.ofEpochSecond(6000))
import scala.jdk.CollectionConverters._
val _files = java.nio.file.Files.list(d).iterator().asScala.toSeq
_files.par.foreach(p =>
  java.nio.file.Files.setLastModifiedTime(p, mt))
val q = spark.readStream.format("whisper").load(s"$dir/*.wsp")
  .writeStream.format("noop").trigger(Trigger.ProcessingTime("1 second")).start()
val deadline = System.nanoTime() + 60L * 1000000000L
while (System.nanoTime() < deadline && q.recentProgress.length < 6) Thread.sleep(500)
q.stop()
q.awaitTermination(30000)
q.recentProgress.take(6).zipWithIndex.foreach { case (p, i) =>
  println(s"MARKER_batch$i trigger_ms=${p.durationMs.get("triggerExecution")} " +
    s"addBatch_ms=${p.durationMs.get("addBatch")} latestOffset_ms=${p.durationMs.get("latestOffset")} rows=${p.numInputRows}")
}
sys.exit(0)
