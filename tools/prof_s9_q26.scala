// Round-9 diagnostic: stage-level decomposition of q26 (counting verify,
// sqrt(N) df cap) at 30x and 100x on the wide-alphabet cipher corpus, plus
// the INHERENT candidate volume the cap admits at each scale:
//   candVol = sum over capped grams g of C(df(g), 2)   (upper bound; the
//   length band prunes some) -- the true workload of ANY exact shape that
//   verifies via the gram self-join, including the DuckDB oracle.
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 -i tools/prof_s9_q26.scala \
//     2>/dev/null | grep -o '\[p26\].*'
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

spark.sparkContext.setLogLevel("ERROR")
graft.functions.VectorFunctions.register(spark)
case class St(id: Int, name: String, wallMs: Long, taskMs: Long, gcMs: Long,
              memSpill: Long, diskSpill: Long, shufInRec: Long, shufOutB: Long)
val stages = ArrayBuffer.empty[St]
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val i = e.stageInfo
    val m = i.taskMetrics
    stages.synchronized {
      stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(50),
        i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
        m.executorRunTime, m.jvmGCTime,
        m.memoryBytesSpilled, m.diskBytesSpilled,
        m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.bytesWritten)
    }
  }
})

for (k <- Seq(30, 100)) {
  val dir = s"/tmp/scale9c/k$k"
  // inherent volume: sum C(df,2) over grams under the cap
  val docs = spark.read.parquet(s"$dir/documents.parquet")
  val nd = docs.count()
  val cap = math.max(200L, math.ceil(math.sqrt(nd.toDouble)).toLong)
  val vol = docs.filter(length(col("text")) >= 4)
    .select(col("doc_id"), explode(expr("char_ngrams(text, 4)")).as("g")).distinct()
    .groupBy("g").agg(count(lit(1)).as("df"))
    .filter(col("df") <= cap)
    .agg(sum(expr("df * (df - 1) div 2")).as("v"), count(lit(1)).as("grams"))
    .collect()(0)
  println(s"[p26] k=$k ndocs=$nd cap=$cap cappedGrams=${vol.getLong(1)} candVol=${vol.getLong(0)}")
  for (run <- 1 to 2) {
    spark.catalog.clearCache(); System.gc()
    stages.synchronized(stages.clear())
    val t0 = System.nanoTime()
    val n = graft.operators.DedupOps.ngramJaccard(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[p26] ===== q26 k=$k run$run wall=$wall%.2f s rows=$n =====")
    stages.synchronized {
      stages.sortBy(-_.wallMs).take(10).foreach { s =>
        println(f"[p26] st=${s.id}%4d wall=${s.wallMs}%7d task=${s.taskMs}%8d gc=${s.gcMs}%7d spillM=${s.memSpill/1e6}%8.0f spillD=${s.diskSpill/1e6}%8.0f shufInRec=${s.shufInRec}%11d shufOutMB=${s.shufOutB/1e6}%8.1f  ${s.name}")
      }
    }
  }
}
sys.exit(0)
