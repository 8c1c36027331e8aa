// Round-15 scale probe: q118 diverseRerank re-measured on its FIXED label
// join (broadcast left-semi prefilter + pinned pool -- VERDICT r14 #1), and
// q119 hardNegatives (new this round), at sf0.1 vs the 100x corpus
// (/tmp/graft_sf10, tools/scale_sf10_build.scala). r8 protocol: JIT-warm,
// cache-cold (all session memos invalidated + clearCache + GC settle
// between runs), min of 2, first run of a JVM discarded.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check15.scala
import graft.operators.{DedupOps, OpCache, TextOps, VectorOps}

spark.sparkContext.setLogLevel("ERROR")

def drop(): Unit = {
  OpCache.releaseAll()
  DedupOps.invalidateClusterCache()
  TextOps.invalidateBm25RankCache() // also clears the quality rank memo
  spark.catalog.clearCache(); System.gc()
}
def probe(tag: String)(f: => Any): Unit = {
  f; drop() // JIT warm, discarded
  val r = (1 to 2).map { _ => val t0 = System.nanoTime(); f; val t = (System.nanoTime() - t0) / 1e9; drop(); t }
  println(f"MARKER $tag%-26s min=${r.min}%.3f s runs=${r.map(x => f"$x%.2f").mkString(",")}")
}

for ((tag, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"), ("sf10_100x", "/tmp/graft_sf10"))) {
  probe(s"q118_diverse_rerank/$tag")(TextOps.diverseRerank(spark, dir).count())
  probe(s"q119_hard_negatives/$tag")(VectorOps.hardNegatives(spark, dir).count())
}
sys.exit(0)
