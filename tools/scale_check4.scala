// Scaling check 4: the round-4 curation operators at 1x/3x/10x sf0.1.
// Same replicated corpora as scale_check.scala / scale_check2 / scale_check3.
// Expectations by construction:
//   q88 semantic dedup  -- assignment is map-side; pair cost grows with the
//                         within-cluster near-dup population (output-bound,
//                         like q28), not with corpus^2;
//   q89 bigram LM       -- linear: two vocabulary-keyed partial-agg shuffles
//                         + broadcast-back joins;
//   q90 overlap ppm     -- linear in train side; benchmark side broadcast;
//   q91 quality model   -- pure scan+project, should ride unused cores flat;
//   q92 PQ encode       -- pure map-side fold, flat like q91;
//   q93 ExactSubstr     -- linear in total chars; gram shuffle is the only
//                         wide op (replicated docs: dup population grows
//                         k^2-ish in PAIRS but per-doc profile stays
//                         row-linear, which is what this measures).
// The replicated corpora REUSE ivfIndex's per-dir memoized centroids, so
// q88/q92 pay the one-time index build inside the first (warm) run only --
// mirroring production, where codebooks are built once and amortized.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check4.scala
import org.apache.spark.sql.functions._

val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

def mkScale(k: Int): String = {
  val dir = s"/tmp/graft_scl4_$k"
  (0 until k).map { i =>
    docsBase.select(
      (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
      if (i == 0) col("text") else concat(col("text"), lit(s" v$i")).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  // CONTIGUOUS vec_ids across replicas (offset by the base count, not 1e6):
  // ivfCentroids samples systematically by id (vec_id % step == 0), which
  // presumes a dense id space -- sparse replica offsets would leave most of
  // the 16 codebook slots empty (a real corpus samples by hash; the dense
  // assumption is the documented contract of the systematic variant).
  val embN = embBase.count()
  (0 until k).map { i =>
    embBase.select(
      (col("vec_id") + lit(i.toLong * embN)).as("vec_id"),
      expr(s"transform(embedding, x -> cast(x + ${i}e-3f as float))").as("embedding"),
      col("label"))
  }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  dir
}

// q88 is measured twice: at FIXED k=16 (cluster size grows with the corpus
// -> the quadratic within-cluster term shows, by design) and at k=16*scale
// (constant cluster size -- SemDeDup's own configuration at scale). The
// scaled variant is the 100 TB posture; the fixed row quantifies why.
var scaleK = 1
val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
  "q88_semantic_dedup" -> ((s, d) => graft.operators.VectorOps.semanticDedup(s, d)),
  "q88_scaled_k" -> ((s, d) => graft.operators.VectorOps.semanticDedupScaled(s, d, 16 * scaleK)),
  "q89_bigram_surprisal" -> ((s, d) => graft.operators.TextOps.bigramSurprisal(s, d)),
  "q90_contam_overlap" -> ((s, d) => graft.operators.SamplingOps.contaminationOverlap(s, d)),
  "q91_quality_model" -> ((s, d) => graft.operators.TextOps.qualityClassifier(s, d)),
  "q92_pq_quantize" -> ((s, d) => graft.operators.VectorOps.pqQuantize(s, d)),
  "q93_substring_dup" -> ((s, d) => graft.operators.DedupOps.substringDup(s, d)),
  "q94_knn_batch" -> ((s, d) => graft.operators.VectorOps.batchKnn(s, d)),
  "q95_pq_adc_search" -> ((s, d) => graft.operators.VectorOps.pqAdcSearch(s, d)),
  "q96_simhash_portable" -> ((s, d) => graft.operators.DedupOps.simhashPortable(s, d)),
  "q97_winnow_portable" -> ((s, d) => graft.operators.DedupOps.winnowPortable(s, d)),
  "q98_pretrain_export" -> ((s, d) => graft.operators.SamplingOps.pretrainExport(s, d))
)

for (k <- Seq(1, 3, 10)) {
  val dir = mkScale(k)
  scaleK = k
  for ((name, fn) <- ops) {
    fn(spark, dir).count() // warm (first run builds/memoizes the per-dir IVF index)
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val out = fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    println(f"[scale4] k=$k%2d $name%-22s ${dt}%7.2f s out=$out")
  }
}
sys.exit(0)
