// Round-8 scaling check, part C: the EVENTS-table shapes (user-keyed
// windows and state machines -- the family parts A/B did not cover) at
// 1x/10x/30x/100x. Scaling law: user_id and event_id perturbed
// (key*k + r), ts left unchanged -- user cardinality scales with rows,
// events-per-user and the time axis stay constant, which is how a
// real event stream grows (more users, same horizon). Window functions
// partition by user_id, so this directly stresses the per-key window
// sort and the session/funnel state shapes.
//
// Protocol: identical to scale_check8b final (first run discarded as
// JIT/plan warmup; official = min of 2 cache-cold JIT-warm runs,
// GC-settled between queries; shuffle bytes from a stage listener).
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/scale_check8c.scala 2>/dev/null | grep -o '\[s8c\].*'
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.sparkContext.setLogLevel("ERROR")

object Shuf {
  @volatile var total = 0L
  @volatile var peak = 0L
  def reset(): Unit = { total = 0L; peak = 0L }
}
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    Shuf.total += w
    if (w > Shuf.peak) Shuf.peak = w
  }
})

val ev0 = graft.operators.Tables.t(spark, "/root/testdata/sf0.1", "events")

def mkDir(k: Int): String = {
  val dir = s"/tmp/scale8e/k$k"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    ev0.withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
      .select(
        (col("event_id") * k + col("__r")).as("event_id"),
        col("ts"),
        (col("user_id") * k + col("__r")).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  dir
}

val shapes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
  ("q50_sessionize", graft.operators.TimeSeriesOps.sessionizeBatch(_, _)),
  ("q65_daily_active", graft.operators.RelationalOps.dailyActiveUsers(_, _)),
  ("q79_funnel", graft.operators.TimeSeriesOps.funnel(_, _)),
  ("q80_retention", graft.operators.TimeSeriesOps.retentionCohorts(_, _)))

def gb(b: Long): Double = b / 1e9

for (k <- Seq(1, 10, 30, 100)) {
  val dir = mkDir(k)
  val nev = spark.read.parquet(s"$dir/events.parquet").count()
  println(f"[s8c] ==== k=$k%3d events=$nev%9d ====")
  for ((name, f) <- shapes) {
    Shuf.reset()
    val t0 = System.nanoTime()
    val warmRows = f(spark, dir).count()
    val warm = (System.nanoTime() - t0) / 1e9
    Thread.sleep(700)
    val (sTot, sPeak) = (Shuf.total, Shuf.peak)
    val best = (1 to 2).map { _ =>
      spark.catalog.clearCache(); System.gc()
      val t = System.nanoTime(); f(spark, dir).count(); (System.nanoTime() - t) / 1e9
    }.min
    println(f"[s8c] k=$k%3d $name%-18s rows=$warmRows%9d warm=$warm%8.2f s best=$best%8.2f s " +
      f"shuffle_total=${gb(sTot)}%7.3f GB peak_stage=${gb(sPeak)}%7.3f GB")
    spark.catalog.clearCache(); System.gc()
  }
}
sys.exit(0)
