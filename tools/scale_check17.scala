// Round-17 scale probe: 100x replication-law slopes for the multimodal
// near-dup operators (VERDICT r16 next #4 -- q125/q126/q127 shipped with a
// 10x image slope only) plus the two NEW r17 operators (q128 cross-modal
// dedup, q129 DCT pHash). Corpus: /tmp/graft_sf10 (tools/scale_sf10_build
// .scala, the r14 substitution-cipher/orthogonal-rotation laws). The
// multimodal fixtures derive from doc_id alone (md5 digest bits), so the
// replicated ids carry the same twin classes (doc_id % 50 in {1,2,3}) and
// the operators' blocking semantics are unchanged at 100x.
// Stored-asset fixtures are synthesized ONCE per (process, dir) by the
// discarded warm run -- the timed runs read + decode + hash + join, the
// production shape (q127's stored-assets discipline, now all modalities).
// r8 protocol: JIT-warm, cache-cold (session memos invalidated +
// clearCache + GC settle between runs), min of 2, first run discarded.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check17.scala
import graft.operators.{DedupOps, MultimodalOps, OpCache, TextOps}

spark.sparkContext.setLogLevel("ERROR")

def drop(): Unit = {
  OpCache.releaseAll()
  DedupOps.invalidateClusterCache()
  TextOps.invalidateBm25RankCache() // also clears the quality rank memo
  spark.catalog.clearCache(); System.gc()
}
def probe(tag: String)(f: => Any): Unit = {
  f; drop() // JIT warm (and one-time fixture synthesis), discarded
  val r = (1 to 2).map { _ => val t0 = System.nanoTime(); f; val t = (System.nanoTime() - t0) / 1e9; drop(); t }
  println(f"MARKER $tag%-30s min=${r.min}%.3f s runs=${r.map(x => f"$x%.2f").mkString(",")}")
}

for ((tag, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"), ("sf10_100x", "/tmp/graft_sf10"))) {
  probe(s"q125_image_phash/$tag")(MultimodalOps.imagePhashDedup(spark, dir).count())
  probe(s"q126_audio_fingerprint/$tag")(MultimodalOps.audioFingerprintDedup(spark, dir).count())
  probe(s"q127_video_phash/$tag")(MultimodalOps.videoPhashDedup(spark, dir).count())
  probe(s"q129_dct_phash/$tag")(MultimodalOps.dctPhashDedup(spark, dir).count())
  probe(s"q130_audio_landmark/$tag")(MultimodalOps.audioLandmarkDedup(spark, dir).count())
  probe(s"q128_crossmodal/$tag")(DedupOps.crossModalDedup(spark, dir).count())
}
sys.exit(0)
