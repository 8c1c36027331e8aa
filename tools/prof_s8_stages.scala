// Round-8 diagnostic 2: stage-level decomposition of q89's run1-vs-run2 gap
// at k=100 (43.9s vs 12.3s, GC excluded by prof_s8_q60q89). Prints every
// stage's wall, task time, and record counts for two consecutive runs.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//   --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//   --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.shuffle.partitions=32 -i tools/prof_s8_stages.scala
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

spark.sparkContext.setLogLevel("ERROR")
case class St(id: Int, name: String, wallMs: Long, taskMs: Long, recIn: Long, recShufIn: Long, recShufOutB: Long)
val stages = ArrayBuffer.empty[St]
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val i = e.stageInfo
    val m = i.taskMetrics
    stages.synchronized {
      stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60),
        i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
        m.executorRunTime, m.inputMetrics.recordsRead,
        m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.bytesWritten)
    }
  }
})

val dir = "/tmp/scale8c/k100"
for (run <- 1 to 2) {
  stages.synchronized(stages.clear())
  val t0 = System.nanoTime()
  val n = graft.operators.TextOps.bigramSurprisal(spark, dir).count()
  val wall = (System.nanoTime() - t0) / 1e9
  Thread.sleep(1000)
  println(f"[ps] ===== q89 run$run wall=$wall%.2f s rows=$n =====")
  stages.synchronized {
    stages.sortBy(-_.wallMs).take(12).foreach { s =>
      println(f"[ps] stage=${s.id}%4d wall=${s.wallMs}%7d ms task=${s.taskMs}%8d ms in=${s.recIn}%10d shufIn=${s.recShufIn}%10d shufOutB=${s.recShufOutB}%12d  ${s.name}")
    }
  }
}
sys.exit(0)
