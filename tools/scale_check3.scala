// Scaling check 3: multimodal codec + quantization paths at 1x/3x/10x sf0.1.
// Same replicated corpora as scale_check.scala / scale_check2.scala. The
// codec stages are map-side per-row work and the quantizer's only wide op is
// a dims-row stats aggregate, so all four should be ~linear in rows with no
// superlinear term.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check3.scala
import org.apache.spark.sql.functions._

val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

def mkScale(k: Int): String = {
  val dir = s"/tmp/graft_scl3_$k"
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
  "q84_png_decode" -> ((s, d) => graft.operators.MultimodalOps.pngDecode(s, d)),
  "q85_audio_decode" -> ((s, d) => graft.operators.MultimodalOps.wavDecode(s, d)),
  "q86_video_decode" -> ((s, d) => graft.operators.MultimodalOps.videoFrameDecode(s, d)),
  "q87_sq_quantize" -> ((s, d) => graft.operators.VectorOps.scalarQuantize(s, d))
)

for (k <- Seq(1, 3, 10)) {
  val dir = mkScale(k)
  for ((name, fn) <- ops) {
    fn(spark, dir).count() // warm (also materializes q86's stored assets)
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val out = fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    println(f"[scale3] k=$k%2d $name%-18s ${dt}%7.2f s out=$out")
  }
}
sys.exit(0)
