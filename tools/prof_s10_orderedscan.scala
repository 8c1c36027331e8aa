// Round-10 probe (VERDICT r9 #3): oversized timeSort archives no longer scan
// as one straggler task. Synthesizes a 48M-point (576 MB) single-archive
// whisper file — the max-retention shape the u32 points field admits — and
// A/Bs `orderBy(timestamp)` end-to-end:
//   A) orderedSplit=false : one partition, ring-rotation sort in ONE task
//      (the pre-r10 shape; also the documented escape hatch)
//   B) default            : rotation-probed ordered chunks (8M points each),
//      multi-task scan, Sort+Exchange elided, windows runtime-enforced
//   C) default, no orderBy: chunked plain scan (per-partition ordered)
// plus a rotated variant of the same file. Verifies: B's plan has no
// Sort/Exchange, B plans >1 partition, and A and B produce identical
// ordered output (row-sequence md5).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC -i tools/prof_s10_orderedscan.scala
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.format.WhisperWriter
import graft.format.WhisperWriter.{ArchiveSpec, FileSpec}

val points = 48L * 1000 * 1000
val outDir = Files.createDirectories(Paths.get("/tmp/prof_s10_orderedscan"))

def mk(name: String, rotation: Long): String = {
  val p = outDir.resolve(name)
  if (!Files.exists(p)) {
    println(s"writing $name (${points} points, rotation=$rotation) ...")
    WhisperWriter.writeFile(p, FileSpec(archives = Seq(
      ArchiveSpec(secondsPerPoint = 10, points = points, filled = points,
        lastTimestamp = 1700000000L, rotation = rotation))))
  }
  p.toString
}

val unrotated = mk("huge_unrot.wsp", 0L)
val rotated = mk("huge_rot.wsp", 31234567L)

def read(path: String, orderedSplit: Boolean) =
  spark.read.format("whisper")
    .option("orderedSplit", orderedSplit.toString)
    .load(path)
    .select("timestamp", "value")

// order-sensitive distributed fingerprint: each row hashed WITH its global
// position (zipWithIndex numbers rows in partition-index order, which is the
// elided output's order), summed — any reordering changes the sum
def seqHash(df: org.apache.spark.sql.DataFrame): String = {
  val (s, n) = df.rdd.zipWithIndex
    .map { case (r, i) =>
      (scala.util.hashing.MurmurHash3.productHash((i, "" + r.get(0), "" + r.get(1))).toLong, 1L)
    }
    .fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
  s"$s/$n"
}

def time[T](f: => T): (T, Double) = {
  val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
}

for (path <- Seq(unrotated, rotated)) {
  println(s"\n=== ${Paths.get(path).getFileName} ===")
  val chunkedSorted = read(path, orderedSplit = true).orderBy("timestamp")
  val plan = chunkedSorted.queryExecution.executedPlan.toString
  val nParts = read(path, orderedSplit = true).rdd.getNumPartitions
  println(s"chunked partitions: $nParts; plan has Sort: ${plan.contains("Sort [")}, " +
    s"Exchange: ${plan.contains("Exchange")}")

  // warm (page cache + codegen), then min-of-2 per variant
  read(path, orderedSplit = true).count()
  def best2(f: => Double): Double = Seq(f, f).min

  val tChunkScan = best2(time(read(path, orderedSplit = true).agg(count(lit(1))).collect())._2)
  val tSingleScan = best2(time(read(path, orderedSplit = false).agg(count(lit(1))).collect())._2)
  val (hChunk, tChunkSortedFirst) = time(seqHash(chunkedSorted))
  val tChunkSorted = Seq(tChunkSortedFirst, time(seqHash(chunkedSorted))._2).min
  val singleSorted = read(path, orderedSplit = false).orderBy("timestamp")
  val (hSingle, tSingleSortedFirst) = time(seqHash(singleSorted))
  val tSingleSorted = Seq(tSingleSortedFirst, time(seqHash(singleSorted))._2).min

  println(f"scan-only      : chunked $tChunkScan%.2f s  vs single-task $tSingleScan%.2f s")
  println(f"orderBy(ts) e2e: chunked $tChunkSorted%.2f s vs single-task $tSingleSorted%.2f s")
  println(s"ordered-output hash: chunked $hChunk vs single $hSingle " +
    s"identical=${hChunk == hSingle}")
}
println("\nprof_s10_orderedscan done")
System.exit(0)
