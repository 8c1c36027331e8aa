// Round-9 scaling check, part 3: q26 (whatever shape ngramJaccard currently
// binds -- used to A/B the sqrt(N)-cap counting, sqrt(N)-cap prefix-hybrid,
// and final constant-cap counting variants) on the wide-alphabet cipher
// corpus built by scale_check9b (/tmp/scale9c).
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 -i tools/scale_check9c.scala \
//     2>/dev/null | grep -o '\[s9c\].*'
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.sparkContext.setLogLevel("ERROR")
graft.functions.VectorFunctions.register(spark)

object Shuf {
  @volatile var total = 0L
  def reset(): Unit = { total = 0L }
}
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    Shuf.total += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
  }
})

def timed(label: String)(body: => Long): Unit = {
  val t0 = System.nanoTime()
  val warmRows = body
  val warm = (System.nanoTime() - t0) / 1e9
  val best = (1 to 2).map { _ =>
    spark.catalog.clearCache(); System.gc(); Shuf.reset()
    val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
  }.min
  println(f"[s9c] $label%-30s rows=$warmRows%10d warm=$warm%8.2f s best=$best%8.2f s shufMB=${Shuf.total / 1e6}%9.1f")
  spark.catalog.clearCache(); System.gc()
}

for (k <- Seq(1, 10, 30, 100)) {
  val dir = s"/tmp/scale9c/k$k"
  require(new java.io.File(s"$dir/_DONE").exists, s"run scale_check9b first: $dir missing")
  timed(s"q26_ngram_jaccard k=$k") {
    graft.operators.DedupOps.ngramJaccard(spark, dir).count()
  }
}
sys.exit(0)
