// Round-12 adjudication of the r11 ann_tuning anomaly (VERDICT r11 #2):
//  (a) where does q105's wall go -- does it vary with nprobe at all, or is
//      it scheduling floor? 3 timed runs per nprobe, plus Spark job counts.
//  (b) reconcile r4's recall table (0.95-1.00 @ nprobe=4, recall@20, single
//      query with true near-dup siblings, replicated corpora) with r11's
//      curve (0.538 @ nprobe=4, MEAN recall@10 over an 8-query panel on the
//      raw 2k corpus): same operator, different similarity regimes. Measure
//      the deployment regime (replicated = near-dup-dense) at the same
//      panel discipline as q105.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        --conf spark.sql.shuffle.partitions=32 -i tools/prof_s12_ann.scala
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

val dir = "/root/testdata/sf0.1"
graft.functions.VectorFunctions.register(spark)

val jobs = new AtomicInteger(0)
spark.sparkContext.addSparkListener(new SparkListener {
  override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
})

// (a) wall vs nprobe, 3 runs each, job counts
println("nprobe | recall@10 | walls (3 runs, s) | jobs/run")
for (np <- Seq(1, 2, 4, 8, 16)) {
  var recall = -1.0
  val walls = (1 to 3).map { _ =>
    spark.catalog.clearCache()
    graft.operators.OpCache.releaseAll()
    val t0 = System.nanoTime()
    val j0 = jobs.get()
    val hits = graft.operators.VectorOps.annRecall(spark, dir, k = 10, nprobe = np, panel = 8)
      .agg(sum("hits")).head().getLong(0)
    recall = hits / 80.0
    ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
  }
  println(f"$np%6d | ${recall}%.3f | ${walls.map(w => f"${w._1}%.2f").mkString(" ")} | ${walls.map(_._2).mkString(",")}")
}

// (b) density regime: replicated corpora (the r4/scale_check2 law -- each
// replica is the base corpus nudged by i*1e-3, so replicas are TRUE
// near-dups at cos~1 of their base rows). Panel = the q105 discipline
// (8 query vectors, corpus = the rest), recall@10 vs exact, nprobe=4.
import graft.operators.AnnIndex
val embBase = spark.read.parquet(s"$dir/embeddings.parquet")
def mkScale(k: Int) =
  (0 until k).map { i =>
    embBase.select(
      (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
      expr(s"transform(embedding, x -> cast(x + ${i}e-3f as float))").as("embedding"))
  }.reduce(_ unionByName _)
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("emb"))

for (k <- Seq(1, 3, 10); np <- Seq(4, 16)) {
  val e = mkScale(k).cache(); val n = e.count()
  val cents = AnnIndex.ivfCentroids(e, "emb", "vec_id", 16, n)
  val assigned = AnnIndex.ivfAssign(e.filter(col("vec_id") >= 8), "emb", "vec_id", cents).cache()
  assigned.count()
  val recalls = (0 until 8).map { q =>
    val qv = e.filter(col("vec_id") === q).head().getSeq[Double](1).toArray
    val corpus = e.filter(col("vec_id") >= 8)
    val qLit = qv.map(x => s"${x}D").mkString("array(", ",", ")")
    val cosCol = expr(s"dot_d(emb, $qLit) / (sqrt(dot_d(emb, emb)) * sqrt(dot_d($qLit, $qLit)))")
    val exact = corpus.select(col("vec_id"), cosCol.as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val got = AnnIndex.ivfSearch(assigned, cents, "emb", qv, k = 10, nprobe = np)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    (exact & got).size / 10.0
  }
  println(f"[density] corpus=${k}x nprobe=$np mean_recall@10=${recalls.sum / 8}%.3f per_query=${recalls.map(r => f"$r%.1f").mkString(",")}")
  assigned.unpersist(); e.unpersist()
}
sys.exit(0)
