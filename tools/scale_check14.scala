// Round-14 scale probe: the two new corpus-rank fusion queries (q115
// rrfFusionCorpus, q116 hybridRetrieval) at sf0.1 vs the 100x corpus
// (/tmp/graft_sf10, tools/scale_sf10_build.scala). r8 protocol: JIT-warm,
// cache-cold (clearCache + GC settle between runs), min of 2, first run
// of a JVM discarded. The interesting question at 100x: do the two
// prefix-offset rank legs (range exchange + pid windows) and the FULL
// OUTER fusion SMJ stay data-proportional, or does a rank leg bottleneck?
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check14.scala
import graft.operators.TextOps

spark.sparkContext.setLogLevel("ERROR")

def drop(): Unit = {
  graft.operators.OpCache.releaseAll()
  graft.operators.DedupOps.invalidateClusterCache()
  spark.catalog.clearCache(); System.gc()
}
def probe(tag: String)(f: => Any): Unit = {
  f; drop() // JIT warm, discarded
  val r = (1 to 2).map { _ => val t0 = System.nanoTime(); f; val t = (System.nanoTime() - t0) / 1e9; drop(); t }
  println(f"MARKER $tag%-22s min=${r.min}%.3f s runs=${r.map(x => f"$x%.2f").mkString(",")}")
}

for ((tag, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"), ("sf10_100x", "/tmp/graft_sf10"))) {
  probe(s"q115_rrf_corpus/$tag")(TextOps.rrfFusionCorpus(spark, dir).count())
  probe(s"q116_hybrid/$tag")(TextOps.hybridRetrieval(spark, dir).count())
}
sys.exit(0)
