// Round-12 probe: wall + shuffle of the new retrieval/sampling operators
// (q110 BM25, q111 RRF, q112 weighted sample) on 1x/30x/100x replicated
// document corpora -- the scale posture evidence the other text operators
// already carry (BENCH_NOTES r8 protocol: substitution-cipher replicas
// preserve token lengths; doc_id*k+r keeps ids distinct; min of 2
// cache-cold JIT-warm runs, first discarded).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check12_text.scala
import org.apache.spark.sql.functions._

val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val cols = base.columns

def mkDir(k: Int): String = {
  val out = s"/tmp/scale12_text/x$k"
  if (!new java.io.File(out + "/documents.parquet").exists) {
    val reps = (0 until k).map { r =>
      // substitution cipher per replica: rotate a-z by r (length-preserving,
      // vocabulary grows with k so df/tf tables scale realistically)
      val from = ('a' to 'z').mkString
      val to = ('a' to 'z').map(c => (((c - 'a') + r) % 26 + 'a').toChar).mkString
      base.withColumn("doc_id", col("doc_id") * k + lit(r))
        .withColumn("text", translate(col("text"), from, to))
    }
    reps.reduce(_ unionByName _).select(cols.map(col): _*)
      .write.mode("overwrite").parquet(out + "/documents.parquet")
  }
  out
}


def timeOp(tag: String, k: Int, f: () => Long): Unit = {
  val walls = (1 to 3).map { i =>
    spark.catalog.clearCache(); graft.operators.OpCache.releaseAll(); System.gc()
    val t0 = System.nanoTime()
    val n = f()
    val w = (System.nanoTime() - t0) / 1e9
    (w, n)
  }
  // first run discarded (JIT), min of the remaining two
  val best = walls.drop(1).map(_._1).min
  println(f"MARKER_$tag x$k wall=${best}%.2f rows=${walls.last._2}")
}

for (k <- Seq(1, 30, 100)) {
  val dir = mkDir(k)
  timeOp("bm25", k, () => graft.operators.TextOps.bm25TopK(spark, dir).count())
  timeOp("rrf", k, () => graft.operators.TextOps.rrfFusion(spark, dir).count())
  timeOp("wsample", k, () => graft.operators.SamplingOps.weightedSample(spark, dir).count())
}
sys.exit(0)
