// Round-9 scaling check, part 2 (after the argmin_pair + 4x-supers fix):
//  B2. Hierarchical vs direct assignment at k=70,000 on the CLUSTERABLE
//      planted corpus (200 tight blobs) -- the geometry the hierarchy
//      exists for. First run of this section (sqrt(k) supers + min_by)
//      spilled in SortAggregate; this rerun carries the fix: 4x sqrt(k)
//      supers (blob coverage) and the hash-aggregable argmin_pair.
//      Buckets must match the direct kernel bit-for-bit.
//  C.  q26 (scaled df cap, r9) on the WIDE-ALPHABET cipher corpus --
//      retires the 26^4 gram-space-saturation residue from r8.
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/scale_check9b.scala 2>/dev/null | grep -o '\[s9\].*'
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  println(f"[s9] $label%-34s rows=$warmRows%10d warm=$warm%8.2f s best=$best%8.2f s shufMB=${Shuf.total / 1e6}%9.1f")
  spark.catalog.clearCache(); System.gc()
}

// B2 (CLUSTERABLE corpus -- 200 tight hash-planted clusters, the geometry
// real embedding corpora have): the hierarchy's Lloyd+snap supers get
// compact cells, the probe keeps a handful of them, and the join-based
// shape becomes viable for k past the direct ceiling. Buckets must match
// the direct kernel bit-for-bit (exactness is geometry-independent).
println("[s9] ==== B2: k=70000 hierarchical vs direct, clusterable corpus ====")
locally {
  val dir = "/tmp/scale9b/planted"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    spark.range(200000).select(col("id").as("vec_id"))
      .withColumn("emb", expr(
        """transform(sequence(0, 63), d ->
          |  cast(xxhash64(concat('c', cast(pmod(vec_id, 200) as string), '_', cast(d as string))) % 1000L as double) / 1000.0
          |  + cast(xxhash64(concat('n', cast(vec_id as string), '_', cast(d as string))) % 1000L as double) / 50000.0)""".stripMargin))
      .coalesce(8).write.mode("overwrite").parquet(dir)
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  val e = spark.read.parquet(dir).select(col("vec_id"), col("emb"))
  val n = e.count()
  val cents = graft.operators.AnnIndex.ivfCentroids(e, "emb", "vec_id", 70000, n)
  timed("planted hier k=70000") {
    graft.operators.AnnIndex.ivfAssignHierarchical(e, "emb", Some("vec_id"), cents)
      .groupBy("bucket").count().count()
  }
  timed("planted direct k=70000") {
    graft.operators.AnnIndex.ivfAssign(e, "emb", "vec_id", cents)
      .groupBy("bucket").count().count()
  }
  val direct = graft.operators.AnnIndex.ivfAssign(e, "emb", "vec_id", cents)
    .select(col("vec_id"), col("bucket").as("b1"))
  val hier = graft.operators.AnnIndex.ivfAssignHierarchical(e, "emb", Some("vec_id"), cents)
    .select(col("vec_id"), col("bucket").as("b2"))
  val diff = direct.join(hier, Seq("vec_id")).filter(col("b1") =!= col("b2")).count()
  println(s"[s9] planted bucket mismatches direct-vs-hier: $diff (MUST be 0)")
}

// ---- C: q26 with the scaled df cap on a wide-alphabet cipher corpus
val lower = "abcdefghijklmnopqrstuvwxyz"
val upper = lower.toUpperCase
val digit = "0123456789"
val punct = "!#$%&()*+,-:;<=>?@[]^_{}~"
val srcAlpha = lower + upper + digit
val pool = (lower + upper + digit + punct).toList // 87 chars
def wideCipher(r: Int): String = {
  if (r == 0) srcAlpha
  else {
    val sh = new scala.util.Random(41000 + r).shuffle(pool)
    sh.take(62).mkString // 26 lower-images + 26 upper-images + 10 digit-images
  }
}
def mkDocDir(k: Int): String = {
  val dir = s"/tmp/scale9c/k$k"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    val dc0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (0 until k).foreach { r =>
      dc0.select(
          (col("doc_id") * k + lit(r)).as("doc_id"),
          translate(col("text"), srcAlpha, wideCipher(r)).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .coalesce(4)
        .write.mode(if (r == 0) "overwrite" else "append")
        .parquet(s"$dir/documents.parquet")
    }
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  dir
}
println("[s9] ==== C: q26 scaled-df-cap, wide-alphabet corpus ====")
for (k <- Seq(1, 10, 30, 100)) {
  val dir = mkDocDir(k)
  timed(s"q26_ngram_jaccard k=$k") {
    graft.operators.DedupOps.ngramJaccard(spark, dir).count()
  }
}
sys.exit(0)
