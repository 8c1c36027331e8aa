// Round-17 q128 decomposition: where do 5.1 s go?
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        --conf spark.sql.shuffle.partitions=32 -i tools/prof_s17_q128.scala
import graft.operators._
val dir = "/root/testdata/sf0.1"
def time[A](label: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()
def drop(): Unit = {
  OpCache.releaseAll(); DedupOps.invalidateClusterCache()
  TextOps.invalidateBm25RankCache(); spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
}
// warm (fixture build + codegen)
noop(DedupOps.crossModalDedup(spark, dir)); drop()
for (round <- 1 to 2) {
  println(s"== round $round")
  time("image pairs")(noop(MultimodalOps.imagePhashDedup(spark, dir)))
  time("audio pairs")(noop(MultimodalOps.audioFingerprintDedup(spark, dir)))
  time("video pairs")(noop(MultimodalOps.videoPhashDedup(spark, dir)))
  time("text labels (q60 lineage)")(noop(DedupOps.dedupClusters(spark, dir)))
  drop()
  time("q128 full, cold")(noop(DedupOps.crossModalDedup(spark, dir)))
  drop()
}
System.exit(0)
