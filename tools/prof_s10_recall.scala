// Round-10 scaling check for q105 (annRecall): 1x/30x/100x embedding
// replicas through the r8 signed-permutation law (orthogonal transforms --
// within-replica geometry exact, reuses /tmp/scale8v dirs from
// scale_check9). The probe validates the SHAPE claim in the scaladoc: both
// legs are single corpus passes reduced by the TopKAgg partial aggregate
// (shuffle carries queries x tasks x 10 tuples regardless of corpus size),
// probe selection and the hit join touch O(queries) rows -- so wall should
// grow ~linearly with rows and shuffle bytes should stay FLAT.
//
// Panel note: under the replica law vec_id' = vec_id*k + r, "vec_id < 8"
// selects sign-permuted copies of base vector 0 -- a different PANEL than
// the base corpus's, which changes recall VALUES but not the work shape
// (8 queries x corpus cosines + assignment); correctness at the base panel
// is the oracle's job (CORRECTNESS r10), this probe times the shape only.
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/prof_s10_recall.scala 2>/dev/null | grep -o '\[s10r\].*'
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.sparkContext.setLogLevel("ERROR")

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
  println(f"[s10r] $label%-28s rows=$warmRows%8d warm=$warm%7.2f s best=$best%7.2f s shufMB=${Shuf.total / 1e6}%8.1f")
  spark.catalog.clearCache(); System.gc()
}

val dim = 64
def signedPermExpr(r: Int): String = {
  if (r == 0) "embedding"
  else {
    val perm = new scala.util.Random(7000 + r).shuffle((1 to dim).toList)
    val terms = (0 until dim).map { d =>
      val s = if (new scala.util.Random(9000L + r * 64L + d).nextBoolean()) "-" else ""
      s"${s}element_at(embedding, ${perm(d)})"
    }
    s"array(${terms.mkString(", ")})"
  }
}
def mkVecDir(k: Int): String = {
  val dir = s"/tmp/scale8v/k$k"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    val em0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    (0 until k).foreach { r =>
      em0.select(
          (col("vec_id") * k + lit(r)).as("vec_id"),
          expr(signedPermExpr(r)).as("embedding"),
          col("label"))
        .coalesce(2)
        .write.mode(if (r == 0) "overwrite" else "append")
        .parquet(s"$dir/embeddings.parquet")
    }
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  dir
}

println("[s10r] ==== q105 annRecall at 1x/30x/100x embedding replicas ====")
for (k <- Seq(1, 30, 100)) {
  val dir = mkVecDir(k)
  val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
  timed(s"annRecall k=$k (n=$n)") {
    graft.operators.VectorOps.annRecall(spark, dir).count()
  }
}
sys.exit(0)
