// Round-9 diagnostic: how effective is the hierarchical assignment's
// triangle-inequality cell pruning on the 100x signed-perm corpus?
// Prints avg/median/max probed cells per vector for (a) the raw systematic
// supers and (b) the Lloyd-refined + medoid-snapped supers, at k=70,000
// over the 200k-vector corpus, WITHOUT running the full join — just the
// probe kernel + size().
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//   --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//   --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.shuffle.partitions=32 -i tools/prof_s9_probe.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")

val dir = "/tmp/scale8v/k100"
val e = spark.read.parquet(s"$dir/embeddings.parquet")
  .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("emb"))
graft.functions.VectorFunctions.register(spark)
val n = e.count()
val k = 70000
val cents = graft.operators.AnnIndex.ivfCentroids(e, "emb", "vec_id", k, n).cache()
println(s"[probe] n=$n k=${cents.count()}")

def probeStats(label: String, supersDF: org.apache.spark.sql.DataFrame): Unit = {
  val assigned = graft.operators.AnnIndex.ivfAssign(
    cents.select(col("centroid_id"), col("centroid")), "centroid", supersDF)
  val cellOf = assigned.select(col("centroid_id"), col("centroid"), col("bucket").as("cell"))
  val radius = cellOf
    .join(broadcast(supersDF.select(col("centroid_id").as("cell"), col("centroid").as("scent"))), Seq("cell"))
    .select(col("cell"), expr("sqrt(l2_sq(centroid, scent))").as("r"))
    .groupBy("cell").agg(max("r").as("r"))
    .collect().map(r => r.getAs[Int]("cell") -> r.getAs[Double]("r")).toMap
  val supers = supersDF.collect().map { r =>
    (r.getAs[Int]("centroid_id"), r.getAs[scala.collection.Seq[Double]]("centroid").toArray)
  }.sortBy(_._1)
  val radii = supers.map { case (sid, _) => radius.getOrElse(sid, 0.0) }
  println(f"[probe] $label g=${supers.length} radii: min=${radii.min}%.3f med=${radii.sorted.apply(radii.length/2)}%.3f max=${radii.max}%.3f")
  spark.sessionState.functionRegistry.createOrReplaceTempFunction("sp_probe",
    exprs => graft.functions.IvfSuperProbe(exprs.head, supers.map(_._2), supers.map(_._1), radii, 1e-9), "scala_udf")
  val t0 = System.nanoTime()
  val st = e.limit(20000).select(size(expr("sp_probe(emb)")).as("nc"))
    .agg(avg("nc"), expr("percentile(nc, 0.5)"), max("nc")).head()
  println(f"[probe] $label probed cells avg=${st.getDouble(0)}%.1f med=${st.get(1)} max=${st.get(2)} (${(System.nanoTime()-t0)/1e9}%.1f s for 20k rows)")
}

val g = math.ceil(math.sqrt(k.toDouble)).toLong
val stride = (k + g - 1) / g
probeStats("systematic", cents.filter(col("centroid_id") % stride === 0))

locally {
  import spark.implicits._
  val seedDF = cents.filter(col("centroid_id") % stride === 0)
  val virt = graft.operators.AnnIndex.ivfRefine(cents, "centroid", "centroid_id", seedDF, 2)
  val snapped = graft.operators.AnnIndex.ivfAssign(cents, "centroid", "centroid_id", virt)
    .join(broadcast(virt.select(col("centroid_id").as("bucket"), col("centroid").as("vc"))), Seq("bucket"))
    .select(col("bucket"), col("centroid_id"), expr("l2_sq(centroid, vc)").as("d2"))
    .groupBy("bucket").agg(min_by(col("centroid_id"), struct(col("d2"), col("centroid_id"))).as("sid"))
    .select(col("sid")).collect().map(_.getInt(0))
  probeStats("lloyd+snap", cents.join(broadcast(snapped.toSeq.toDF("centroid_id")), Seq("centroid_id")))
}
sys.exit(0)
