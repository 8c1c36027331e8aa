// Scaling check: dedup-path wall-clock at 1x/3x/10x the sf0.1 corpus.
// Synthesizes perturbed copies (distinct doc_ids, one variant token appended,
// so near-dup structure grows with the corpus instead of collapsing into
// exact-dup groups) into /tmp/graft_scale<k>/documents.parquet, then times
// the LSH/blocking dedup operators end-to-end at each scale.
import org.apache.spark.sql.functions._

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val nBase = base.count()

def mkScale(k: Int): String = {
  val dir = s"/tmp/graft_scale$k"
  val copies = (0 until k).map { i =>
    base.select(
      (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
      if (i == 0) col("text") else concat(col("text"), lit(s" v$i")).as("text"),
      col("lang"), col("source"), col("n_chars")
    )
  }
  copies.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  dir
}

val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
  "q25_minhash" -> ((s, d) => graft.operators.DedupOps.minhashLsh(s, d)),
  "q26_ngram" -> ((s, d) => graft.operators.DedupOps.ngramJaccard(s, d)),
  "q29_simhash" -> ((s, d) => graft.operators.DedupOps.simhash(s, d)),
  "q60_clusters" -> ((s, d) => graft.operators.DedupOps.dedupClusters(s, d))
)

for (k <- Seq(1, 3, 10)) {
  val dir = mkScale(k)
  val rows = spark.read.parquet(s"$dir/documents.parquet").count()
  for ((name, fn) <- ops) {
    fn(spark, dir).count() // warm: codegen compile
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val out = fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    println(f"[scale] k=$k%2d docs=$rows%7d $name%-14s ${dt}%7.2f s out=$out")
  }
}
sys.exit(0)
