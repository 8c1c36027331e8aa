// Round-9 probe: decompose q104's streaming-bench wall (5.8 s at r8 vs
// ~1.4-1.9 s for its q101-q103 peers). The batch dual hash-matches, so this
// is purely a latency question: how much of the wall is micro-batch
// trigger + state-store machinery vs real join work?
//
// Method: run the identical replay (StreamReplay.intervalJoinReplay) with a
// StreamingQueryListener recording every micro-batch's durationMs breakdown
// (triggerExecution, addBatch, getBatch, walCommit, commitOffsets,
// queryPlanning) and the stateOperators' rows/memory. Sum over batches =
// the engine-side wall; the remainder is session/plan setup.
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/prof_s9_q104.scala 2>/dev/null | grep -o '\[s9q104\].*'
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

spark.sparkContext.setLogLevel("ERROR")

case class B(batchId: Long, rows: Long, durs: Map[String, Long], stateRows: Long, stateMemMB: Double)
val batches = ArrayBuffer.empty[B]
spark.streams.addListener(new StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    import scala.jdk.CollectionConverters._
    val durs = p.durationMs.asScala.map { case (k, v) => (k, v.longValue) }.toMap
    val st = p.stateOperators
    batches += B(p.batchId, p.numInputRows,
      durs,
      if (st.isEmpty) 0L else st.map(_.numRowsTotal).sum,
      if (st.isEmpty) 0.0 else st.map(_.memoryUsedBytes).sum / 1e6)
  }
})

val dir = "/root/testdata/sf0.1"
for (round <- 1 to 3) {
  batches.clear()
  val t0 = System.nanoTime()
  val n = graft.streaming.StreamReplay.intervalJoinReplay(spark, dir).count()
  val wall = (System.nanoTime() - t0) / 1e9
  Thread.sleep(500) // let the last progress event land
  println(f"[s9q104] round=$round wall=$wall%6.2f s rows=$n batches=${batches.size}")
  val keys = Seq("triggerExecution", "queryPlanning", "getBatch", "addBatch",
    "walCommit", "commitOffsets", "latestOffset")
  batches.sortBy(_.batchId).foreach { b =>
    val parts = keys.flatMap(k => b.durs.get(k).map(v => f"$k=$v%dms")).mkString(" ")
    println(f"[s9q104]   batch=${b.batchId}%2d in=${b.rows}%7d stateRows=${b.stateRows}%7d stateMB=${b.stateMemMB}%6.1f $parts")
  }
  val trig = batches.map(_.durs.getOrElse("triggerExecution", 0L)).sum / 1000.0
  println(f"[s9q104] round=$round sum(triggerExecution)=$trig%6.2f s of wall=$wall%6.2f s (rest = session/plan setup + sink read)")
  spark.catalog.clearCache()
}
// peer reference: q103 dedup replay, same listener
batches.clear()
val t0 = System.nanoTime()
val n103 = graft.streaming.StreamReplay.dedupReplay(spark, dir).count()
val w103 = (System.nanoTime() - t0) / 1e9
Thread.sleep(500)
println(f"[s9q104] q103 wall=$w103%6.2f s rows=$n103 batches=${batches.size} sumTrig=${batches.map(_.durs.getOrElse("triggerExecution", 0L)).sum / 1000.0}%6.2f s")
sys.exit(0)
