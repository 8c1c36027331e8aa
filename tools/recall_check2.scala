// ADC recall: q95 (global PQ ADC) and q99 (IVF+PQ) top-20 vs the EXACT
// L2 top-20 (ADC approximates L2 on the e6-quantized vectors, so L2 is the
// right ground truth; cosine recall vs q27 is reported too for reference).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions -i tools/recall_check2.scala
import org.apache.spark.sql.functions._

for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
  graft.functions.VectorFunctions.register(spark)
  val e = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("emb"))
  val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
  // exact L2 top-20 (excluding the query itself)
  val exactL2 = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
    .select(col("vec_id"),
      expr("aggregate(zip_with(emb, qe, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)").as("d2"))
    .orderBy(col("d2").asc, col("vec_id").asc).limit(20)
    .collect().map(_.getLong(0)).toSet
  val exactCos = graft.operators.VectorOps.knnBruteForce(spark, dir)
    .collect().map(_.getLong(0)).toSet
  val adc = graft.operators.VectorOps.pqAdcSearch(spark, dir)
    .collect().map(_.getLong(0)).toSet
  val ivfpq = graft.operators.VectorOps.ivfPqSearch(spark, dir)
    .collect().map(_.getLong(0)).toSet
  val refined = graft.operators.VectorOps.pqRefineSearch(spark, dir)
    .collect().map(_.getLong(0)).toSet
  def r(a: Set[Long], b: Set[Long]) = a.intersect(b).size / 20.0
  println(f"[recall2] $dir q95-vs-L2=${r(adc, exactL2)}%.2f q99-vs-L2=${r(ivfpq, exactL2)}%.2f " +
    f"q95-vs-cos=${r(adc, exactCos)}%.2f q99-vs-cos=${r(ivfpq, exactCos)}%.2f q100-vs-cos=${r(refined, exactCos)}%.2f")
}
sys.exit(0)
