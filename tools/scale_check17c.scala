// Round-17 OPTIMIZATION: 100x replication-law slopes for the RESHAPED
// operators (bm25 map-side scoring, t-partitioned propagation loop) -- the
// r8 protocol: min of 2 cache-cold, JIT-warm runs, first run discarded.
// Requires /tmp/graft_sf10 (tools/scale_sf10_build.scala).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check17c.scala
import graft.operators._
spark.sparkContext.setLogLevel("ERROR")
val lo = "/root/testdata/sf0.1"
val hi = "/tmp/graft_sf10"
def drop(): Unit = {
  OpCache.releaseAll(); DedupOps.invalidateClusterCache()
  TextOps.invalidateBm25RankCache(); spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  System.gc()
}
def run(label: String, f: String => org.apache.spark.sql.DataFrame, dir: String): Double = {
  // warm (JIT) + 2 timed cache-cold runs, min
  f(dir).write.format("noop").mode("overwrite").save(); drop()
  val xs = (1 to 2).map { _ =>
    val t0 = System.nanoTime()
    f(dir).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    drop(); dt
  }
  println(f"[scale] $label%-28s ${xs.min}%8.3f s  (runs=${xs.map(x => f"$x%.1f").mkString(",")})")
  xs.min
}
val only = sys.env.get("SCALE_ONLY").map(_.split(',').toSet)
val ops: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
  ("q110_bm25_topk", (d: String) => TextOps.bm25TopK(spark, d)),
  ("q115_rrf_corpus", (d: String) => TextOps.rrfFusionCorpus(spark, d)),
  ("q60_dedup_clusters", (d: String) => DedupOps.dedupClusters(spark, d)))
  .filter { case (n, _) => only.forall(_.contains(n)) }
for ((name, f) <- ops) {
  val tLo = run(s"$name sf0.1", f, lo)
  val tHi = run(s"$name sf10(100x)", f, hi)
  println(f"[scale] $name%-28s wall slope ${tHi / tLo}%6.1fx for 100x data")
}
System.exit(0)
