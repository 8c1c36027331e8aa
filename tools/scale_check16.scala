// Round-16 scale probe: q118 diverseRerank's 100x slope RE-MEASURED on the
// r15 pinned-pool shape (VERDICT r15 watch #1: the 3.0x slope on record was
// measured on the r14 plan; the pool pin changes the cost structure -- a
// materialization barrier at bench scale buying the zero-label-shuffle path
// at 100 TB -- so the claim and the measurement must match). r8 protocol:
// JIT-warm, cache-cold (all session memos invalidated + clearCache + GC
// settle between runs), min of 2, first run of a JVM discarded.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check16.scala
import graft.operators.{DedupOps, OpCache, TextOps}

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
}
sys.exit(0)
