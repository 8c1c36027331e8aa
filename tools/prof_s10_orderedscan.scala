// Round-10 probe (VERDICT r9 #3): oversized timeSort archives no longer scan
// as one straggler task. Synthesizes a 48M-point (576 MB) single-archive
// whisper file -- the max-retention shape the u32 points field admits -- and
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
// elided output's order), summed -- any reordering changes the sum. NOT used
// for timing: the .rdd row conversion it needs is allocation-bound and
// measured 3-4x run-to-run spread on this box (harness noise, see
// BENCH_NOTES); the TIMED passes drive the sorted pipeline itself with a
// no-op foreach (every row produced in order, zero driver transfer).
def seqHash(df: org.apache.spark.sql.DataFrame): String = {
  val (s, n) = df.rdd.zipWithIndex
    .map { case (r, i) =>
      (scala.util.hashing.MurmurHash3.productHash((i, "" + r.get(0), "" + r.get(1))).toLong, 1L)
    }
    .fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
  s"$s/$n"
}

def time(f: => Unit): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}
def best(lab: String)(f: => Unit): Double = {
  f // warm: JIT + page cache
  val xs = Seq(time(f), time(f), time(f))
  println(f"$lab%-36s best=${xs.min}%6.2f s  samples=${xs.map(x => f"$x%.2f").mkString(",")}")
  xs.min
}

for (path <- Seq(unrotated, rotated)) {
  println(s"\n=== ${Paths.get(path).getFileName} ===")
  val chunkedSorted = read(path, orderedSplit = true).orderBy("timestamp")
  val singleSorted = read(path, orderedSplit = false).orderBy("timestamp")
  val plan = chunkedSorted.queryExecution.executedPlan.toString
  val nParts = read(path, orderedSplit = true).rdd.getNumPartitions
  println(s"chunked partitions: $nParts; plan has Sort: ${plan.contains("Sort [")}, " +
    s"Exchange: ${plan.contains("Exchange")}")

  best("scan-only chunked")(read(path, orderedSplit = true).agg(count(lit(1))).collect())
  best("scan-only single-task")(read(path, orderedSplit = false).agg(count(lit(1))).collect())
  best("orderBy e2e chunked+elided+enforced")(chunkedSorted.foreach(_ => ()))
  best("orderBy e2e single-task")(singleSorted.foreach(_ => ()))
  val (hChunk, hSingle) = (seqHash(chunkedSorted), seqHash(singleSorted))
  println(s"ordered-output hash: chunked $hChunk vs single $hSingle identical=${hChunk == hSingle}")
}
println("\nprof_s10_orderedscan done")
System.exit(0)
