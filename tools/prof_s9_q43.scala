// Round-9 probe (VERDICT r8 #6): pin q43's 100x band. Its warm 100x wall
// ranged 22-73 s across r8 runs; decompose with the stage-metrics listener
// to either attribute the spread to named stages/box drift or find a shape.
//
// Method: on the scale_check9 wide-alphabet document corpora (/tmp/scale9c,
// built by tools/scale_check9.scala -- run that first), run q43 end-to-end
// THREE consecutive times at k=30 and k=100 recording every stage's wall,
// task time, GC time, and shuffle volumes; then time each constituent stage
// (qualityScore, langId, minhashPairs) alone at the same k. If the spread
// reappears, the listener names the stage; if per-stage walls are stable,
// the band was cross-run box drift, not a plan shape.
//
// Run (AFTER sbt package and AFTER scale_check9 built /tmp/scale9c):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/prof_s9_q43.scala 2>/dev/null | grep -o '\[q43\].*'
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.adaptive.enabled", "true")

case class St(id: Int, name: String, wallMs: Long, taskMs: Long, gcMs: Long,
              recIn: Long, recShufIn: Long, shufOutB: Long)
val stages = ArrayBuffer.empty[St]
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val i = e.stageInfo
    val m = i.taskMetrics
    stages.synchronized {
      stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(52),
        i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
        m.executorRunTime, m.jvmGCTime, m.inputMetrics.recordsRead,
        m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.bytesWritten)
    }
  }
})

def gcNow(): Long = {
  import scala.jdk.CollectionConverters._
  java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    .map(_.getCollectionTime).sum
}

def run(label: String, dump: Boolean)(body: => Long): Double = {
  stages.synchronized(stages.clear())
  spark.catalog.clearCache(); System.gc()
  val g0 = gcNow()
  val t0 = System.nanoTime()
  val n = body
  val wall = (System.nanoTime() - t0) / 1e9
  Thread.sleep(800)
  val gc = (gcNow() - g0) / 1000.0
  println(f"[q43] $label%-28s wall=$wall%7.2f s gc=$gc%5.1f s rows=$n%9d stages=${stages.size}")
  if (dump) stages.synchronized {
    stages.sortBy(-_.wallMs).take(10).foreach { s =>
      println(f"[q43]   stage=${s.id}%4d wall=${s.wallMs}%7d ms task=${s.taskMs}%8d ms gc=${s.gcMs}%6d ms in=${s.recIn}%10d shufIn=${s.recShufIn}%9d shufOutMB=${s.shufOutB / 1e6}%8.1f  ${s.name}")
    }
  }
  wall
}

for (k <- Seq(30, 100)) {
  val dir = s"/tmp/scale9c/k$k"
  require(new java.io.File(s"$dir/_DONE").exists, s"run scale_check9 first: $dir missing")
  println(s"[q43] ==== k=$k end-to-end x3 ====")
  val walls = (1 to 3).map(i => run(s"q43 k=$k run$i", dump = true) {
    graft.operators.CurationPipeline.curate(spark, dir).count()
  })
  println(f"[q43] k=$k walls: ${walls.map(w => f"$w%.2f").mkString(" / ")} (spread=${walls.max / walls.min}%.2fx)")
  println(s"[q43] ==== k=$k constituent stages alone ====")
  run(s"qualityScore k=$k", dump = false) { graft.operators.TextOps.qualityScore(spark, dir).count() }
  run(s"langId k=$k", dump = false) { graft.operators.TextOps.langId(spark, dir).count() }
  run(s"minhashPairs k=$k", dump = false) { graft.operators.DedupOps.minhashPairs(spark, dir).count() }
}
sys.exit(0)
