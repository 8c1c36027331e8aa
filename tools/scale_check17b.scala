// Round-17 scale probe B: 100x replication-law slopes for the two newest
// operators -- q131 paragraph dedup (CCNet-style chunk dedup; the
// substitution-cipher law preserves within-replica chunk repeats exactly,
// so duplicate volume scales linearly) and q132 streaming LSH dedup (the
// replay drives the REAL micro-batch engine over the replicated corpus).
// Corpus: /tmp/graft_sf10 (tools/scale_sf10_build.scala). r8 protocol:
// JIT-warm, cache-cold, min of 2, first run discarded.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check17b.scala
import graft.operators.{DedupOps, OpCache, TextOps}

spark.sparkContext.setLogLevel("ERROR")

def drop(): Unit = {
  OpCache.releaseAll()
  DedupOps.invalidateClusterCache()
  TextOps.invalidateBm25RankCache()
  spark.catalog.clearCache(); System.gc()
}
def probe(tag: String)(f: => Any): Unit = {
  f; drop() // JIT warm, discarded
  val r = (1 to 2).map { _ => val t0 = System.nanoTime(); f; val t = (System.nanoTime() - t0) / 1e9; drop(); t }
  println(f"MARKER $tag%-34s min=${r.min}%.3f s runs=${r.map(x => f"$x%.2f").mkString(",")}")
}

for ((tag, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"), ("sf10_100x", "/tmp/graft_sf10"))) {
  // checksum action, not count(): count() lets Catalyst prune the md5
  // rebuild column (and with it most of q131's real work) out of the plan
  probe(s"q131_paragraph_dedup/$tag")(
    DedupOps.paragraphDedup(spark, dir)
      .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("new_hash"),
        org.apache.spark.sql.functions.col("n_chunks"),
        org.apache.spark.sql.functions.col("n_dropped")))).head())
  probe(s"q132_stream_lsh_dedup/$tag")(graft.streaming.StreamReplay.lshDedupReplay(spark, dir).count())
}
sys.exit(0)
