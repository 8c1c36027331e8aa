// Scaling check 2: vector + assembly paths at 1x/3x/10x sf0.1.
// Embeddings: replicated with distinct vec_ids and a deterministic per-copy
// element nudge (keeps near-dup structure growing, avoids degenerate
// identical vectors). Documents: same perturbed copies as scale_check.scala.
import org.apache.spark.sql.functions._

val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

def mkScale(k: Int): String = {
  val dir = s"/tmp/graft_scl2_$k"
  (0 until k).map { i =>
    docsBase.select(
      (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
      if (i == 0) col("text") else concat(col("text"), lit(s" v$i")).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  (0 until k).map { i =>
    embBase.select(
      (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
      expr(s"transform(embedding, x -> cast(x + ${i}e-3f as float))").as("embedding"),
      col("label"))
  }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  dir
}

val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
  "q27_knn_brute" -> ((s, d) => graft.operators.VectorOps.knnBruteForce(s, d)),
  "q28_emb_dedup" -> ((s, d) => graft.operators.VectorOps.embeddingDedup(s, d)),
  "q58_centroids" -> ((s, d) => graft.operators.VectorOps.labelCentroids(s, d)),
  "q75_ivf_topk" -> ((s, d) => graft.operators.VectorOps.ivfTopK(s, d)),
  "q55_seq_pack" -> ((s, d) => graft.operators.SamplingOps.sequencePack(s, d)),
  "q70_bloom_decon" -> ((s, d) => graft.operators.SamplingOps.decontaminateBloom(s, d))
)

for (k <- Seq(1, 3, 10)) {
  val dir = mkScale(k)
  for ((name, fn) <- ops) {
    fn(spark, dir).count() // warm
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val t0 = System.nanoTime()
    val out = fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    println(f"[scale2] k=$k%2d $name%-16s ${dt}%7.2f s out=$out")
  }
}
sys.exit(0)
