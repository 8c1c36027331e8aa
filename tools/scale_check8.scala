// Round-8 scaling check: the five most expensive query shapes (plus q93's
// skewed variant) pushed from the round-7 10x ceiling to 30x/100x replicas
// of their sf0.1 inputs, with SHUFFLE BYTES recorded next to wall time.
// The claim under test: every shape's wall and shuffle volume stay linear
// in input rows at 100x -- i.e. the plans the library ships are the plans
// you'd want on a 1000-executor cluster, not just plans that pass at 600k
// rows.
//
// Scaling law (same as scale_check7 / TPC-H SF semantics): KEY CARDINALITY
// scales with the data, per-key fan-in stays constant.
//  - lineitem/orders/customer: join keys perturbed (key*k + r), so
//    rows-per-order and orders-per-customer are invariant in k.
//  - documents: replica r != 0 suffixes EVERY word with "~r", so each
//    replica preserves the base corpus's internal near-dup structure
//    (within a replica all texts shift identically -> pairwise overlap
//    preserved) while cross-replica gram collisions are suppressed. The
//    true near-dup pair count therefore scales ~k (constant per-doc dup
//    fan-in). This is deliberately NOT round-3's densifying law (one
//    variant token per copy -> every doc gains k-1 siblings and output
//    grows k^2): that law was proven to 10x in scale_check1; at 100x a
//    k^2-output experiment measures output materialization, not plan
//    shape. n_chars is recomputed post-perturbation (q26 bands on it).
//
// Timing: first (warm) run reported separately -- it pays shuffle + any
// internal .cache() population; official = min of 2 subsequent runs (the
// same warm-cache policy Bench.scala uses). Shuffle bytes are captured on
// the warm run via a stage-completion listener (total bytes written +
// peak single stage).
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/scale_check8.scala 2>/dev/null | grep '^\[s8\]'
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

val base = "/root/testdata/sf0.1"
val li0 = spark.read.parquet(s"$base/lineitem.parquet")
val or0 = spark.read.parquet(s"$base/orders.parquet")
val cu0 = spark.read.parquet(s"$base/customer.parquet")
val dc0 = spark.read.parquet(s"$base/documents.parquet")

def rep(df: DataFrame, k: Int, keyCols: Seq[String]): DataFrame = {
  val e = df.withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
  keyCols.foldLeft(e)((d, c) => d.withColumn(c, col(c) * k + col("__r"))).drop("__r")
}

def mkDir(k: Int): String = {
  val dir = s"/tmp/scale8/k$k"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    rep(li0, k, Seq("l_orderkey")).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    rep(or0, k, Seq("o_orderkey", "o_custkey")).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    rep(cu0, k, Seq("c_custkey")).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dc0.withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
      .select(
        (col("doc_id") * k + col("__r")).as("doc_id"),
        when(col("__r") === 0, col("text")).otherwise(expr(
          "array_join(transform(split(text, ' '), w -> concat(w, '~', cast(__r as string))), ' ')"))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  dir
}

val shapes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
  ("q12_tpch3_topk", graft.operators.RelationalOps.tpchQ3 _),
  ("q35_exists_lateship", graft.operators.RelationalOps.existsLateShip _),
  ("q26_ngram_jaccard", graft.operators.DedupOps.ngramJaccard _),
  ("q60_dedup_clusters", graft.operators.DedupOps.dedupClusters _),
  ("q89_bigram_surprisal", graft.operators.TextOps.bigramSurprisal _),
  ("q93_substring_dup", graft.operators.DedupOps.substringDup _))

def gb(b: Long): Double = b / 1e9

for (k <- Seq(1, 10, 30, 100)) {
  val dir = mkDir(k)
  val nli = spark.read.parquet(s"$dir/lineitem.parquet").count()
  val ndc = spark.read.parquet(s"$dir/documents.parquet").count()
  println(f"[s8] ==== k=$k%3d lineitem=$nli%9d docs=$ndc%7d ====")
  for ((name, f) <- shapes) {
    Shuf.reset()
    val t0 = System.nanoTime()
    val warmRows = f(spark, dir).count()
    val warm = (System.nanoTime() - t0) / 1e9
    Thread.sleep(700) // listener bus drain
    val (sTot, sPeak) = (Shuf.total, Shuf.peak)
    val best = (1 to 2).map { _ =>
      val t = System.nanoTime(); f(spark, dir).count(); (System.nanoTime() - t) / 1e9
    }.min
    println(f"[s8] k=$k%3d $name%-22s rows=$warmRows%9d warm=$warm%8.2f s best=$best%8.2f s " +
      f"shuffle_total=${gb(sTot)}%7.3f GB peak_stage=${gb(sPeak)}%7.3f GB")
    spark.catalog.clearCache()
  }
}

// ---- q93 skewed variant at 10x and 30x: one hot 20-gram planted in 30%
// of documents (scale_check5's injection, now at 6x the r5 scale). The
// incidence count partial-aggregates the hot key map-side; the hit join's
// dup-gram relation stays duplicate-grams-only. AQE skew-split covers the
// residue. Expectation: skew run within ~1.3x of the clean run.
for (k <- Seq(10, 30)) {
  val dir = s"/tmp/scale8/skew$k"
  if (!new java.io.File(s"$dir/_DONE").exists) {
    spark.read.parquet(s"/tmp/scale8/k$k/documents.parquet")
      .withColumn("text",
        when(col("doc_id") % 10 < 3,
          concat(col("text"), lit(" ZZHOTGRAMZZHOTGRAMZZHOTGRAMZZHOTGRAMZZ")))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    new java.io.File(s"$dir/_DONE").createNewFile()
  }
  Shuf.reset()
  val t0 = System.nanoTime()
  val rows = graft.operators.DedupOps.substringDup(spark, dir).count()
  val warm = (System.nanoTime() - t0) / 1e9
  Thread.sleep(700)
  val (sTot, sPeak) = (Shuf.total, Shuf.peak)
  val best = (1 to 2).map { _ =>
    val t = System.nanoTime()
    graft.operators.DedupOps.substringDup(spark, dir).count()
    (System.nanoTime() - t) / 1e9
  }.min
  println(f"[s8] k=$k%3d q93_substring_SKEW30     rows=$rows%9d warm=$warm%8.2f s best=$best%8.2f s " +
    f"shuffle_total=${gb(sTot)}%7.3f GB peak_stage=${gb(sPeak)}%7.3f GB")
  spark.catalog.clearCache()
}
sys.exit(0)
