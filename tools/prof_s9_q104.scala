// Round-9 probe (VERDICT r8 #5): decompose the streaming bench tail.
// q104 (stream-stream interval join) runs ~5.8 s in BENCH_r08 vs 1.4-1.9 s
// for q101-q103; the batch dual hash-matches, so this is a latency
// question: trigger count x per-trigger state-store cost vs real work.
//
// Method: run each replay once warm, then once measured, with a
// StreamingQueryListener capturing the engine's own per-batch progress --
// batch count, durationMs breakdown (addBatch / getBatch / walCommit /
// commitOffsets / triggerExecution), state-operator commit times, state
// store instance count, and input rows. The decomposition is the engine's
// accounting, not an inference.
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/prof_s9_q104.scala 2>/dev/null | grep -o '\[q104\].*'
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import scala.collection.mutable.ArrayBuffer

spark.sparkContext.setLogLevel("ERROR")

case class Prog(name: String, batchId: Long, inRows: Long,
                dur: Map[String, Long], stateRows: Long, stateMemB: Long,
                commitMs: Long, numStateOps: Int)
val progs = ArrayBuffer.empty[Prog]
spark.streams.addListener(new StreamingQueryListener {
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    import scala.jdk.CollectionConverters._
    val so = p.stateOperators
    progs.synchronized {
      progs += Prog(p.name, p.batchId, p.numInputRows,
        p.durationMs.asScala.map { case (k, v) => (k, v.toLong) }.toMap,
        so.map(_.numRowsTotal).sum, so.map(_.memoryUsedBytes).sum,
        so.map(_.commitTimeMs).sum, so.length)
    }
  }
})

val sfDir = "/root/testdata/sf0.1"
val replays: Seq[(String, () => Long)] = Seq(
  ("q101_windowed_counts", () => graft.streaming.StreamReplay.windowedCountsReplay(spark, sfDir).count()),
  ("q102_sessionize",      () => graft.streaming.StreamReplay.sessionizeReplay(spark, sfDir).count()),
  ("q103_dedup",           () => graft.streaming.StreamReplay.dedupReplay(spark, sfDir).count()),
  ("q104_interval_join",   () => graft.streaming.StreamReplay.intervalJoinReplay(spark, sfDir).count())
)

replays.foreach { case (label, body) =>
  body() // warm (class load, codegen)
  spark.catalog.clearCache(); System.gc()
  progs.synchronized(progs.clear())
  val t0 = System.nanoTime()
  val rows = body()
  val wall = (System.nanoTime() - t0) / 1e9
  Thread.sleep(500) // let the last progress event land
  val ps = progs.synchronized(progs.toList).sortBy(_.batchId)
  val nb = ps.size
  def tot(k: String) = ps.map(_.dur.getOrElse(k, 0L)).sum
  val trig = tot("triggerExecution"); val add = tot("addBatch")
  val wal = tot("walCommit") + tot("commitOffsets") + tot("commitBatch")
  val get = tot("getBatch") + tot("latestOffset") + tot("queryPlanning")
  val commit = ps.map(_.commitMs).sum
  val stOps = ps.map(_.numStateOps).maxOption.getOrElse(0)
  println(f"[q104] $label%-22s wall=$wall%6.2f s rows=$rows%7d batches=$nb%2d trigger=$trig%5d ms addBatch=$add%5d ms stateCommit=$commit%5d ms wal+offsets=$wal%4d ms plan+get=$get%4d ms stateOps=$stOps inRows=${ps.map(_.inRows).sum}%7d")
  ps.foreach { p =>
    println(f"[q104]   batch=${p.batchId}%2d in=${p.inRows}%7d trigger=${p.dur.getOrElse("triggerExecution", 0L)}%5d ms addBatch=${p.dur.getOrElse("addBatch", 0L)}%5d ms stCommit=${p.commitMs}%5d ms stRows=${p.stateRows}%7d stMemMB=${p.stateMemB / 1e6}%6.1f")
  }
}
sys.exit(0)
