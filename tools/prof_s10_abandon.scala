// Round-10 probe (VERDICT r9 #7): fold the early abandon into the
// hierarchical refine leg. The probe kernel now emits ub2 = (min_s d(v,s))^2
// alongside the candidate cells and the refine computes
// l2_sq_bounded(emb, centroid, ub2) -- each candidate distance abandons once
// its prefix exceeds the vector's upper bound (which the winner can never
// do, so buckets are bit-identical). A/B on the r9 planted corpus (200
// tight blobs, 200k x d=64, k=70,000 fine centroids -- the geometry this
// path exists for), warm run discarded, min-of-2 with cache-clear + GC
// between runs; bucket equality between both refine variants checked.
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 -i tools/prof_s10_abandon.scala \
//     2>/dev/null | grep -o '\[s10a\].*'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("ERROR")
graft.functions.VectorFunctions.register(spark)

val dir = "/tmp/scale9b/planted"
if (!new java.io.File(s"$dir/_DONE").exists) {
  spark.range(200000).select(col("id").as("vec_id"))
    .withColumn("emb", expr(
      """transform(sequence(0, 63), d ->
        |  cast(xxhash64(concat('c', cast(pmod(vec_id, 200) as string), '_', cast(d as string))) % 1000L as double) / 1000.0
        |  + cast(xxhash64(concat('n', cast(vec_id as string), '_', cast(d as string))) % 1000L as double) / 50000.0)""".stripMargin))
    .coalesce(8).write.mode("overwrite").parquet(dir)
  new java.io.File(s"$dir/_DONE").createNewFile()
}
val e = spark.read.parquet(dir).select(col("vec_id"), col("emb"))
val n = e.count()
val cents = graft.operators.AnnIndex.ivfCentroids(e, "emb", "vec_id", 70000, n)
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
cents.count()
println(s"[s10a] planted corpus n=$n, k=70000")

def timed(label: String)(body: => Long): Double = {
  val t0 = System.nanoTime()
  val rows = body
  val warm = (System.nanoTime() - t0) / 1e9
  val best = (1 to 2).map { _ =>
    System.gc()
    val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
  }.min
  println(f"[s10a] $label%-28s rows=$rows%8d warm=$warm%7.2f s best=$best%7.2f s")
  best
}

// the knob is private[graft] (not API surface); flip it via reflection
val knobSetter = graft.operators.AnnIndex.getClass.getDeclaredMethods
  .find(_.getName == "refineEarlyAbandon_$eq").get
knobSetter.setAccessible(true)
def setKnob(v: Boolean): Unit = knobSetter.invoke(graft.operators.AnnIndex, java.lang.Boolean.valueOf(v))

def hier(): Long =
  graft.operators.AnnIndex.ivfAssignHierarchical(e, "emb", Some("vec_id"), cents)
    .groupBy("bucket").count().count()

setKnob(false)
val tPlain = timed("refine plain l2_sq")(hier())
setKnob(true)
val tBounded = timed("refine l2_sq_bounded(ub2)")(hier())
println(f"[s10a] speedup plain/bounded = ${tPlain / tBounded}%.2fx")

// bit-identical buckets between the two refine variants
setKnob(false)
val a = graft.operators.AnnIndex.ivfAssignHierarchical(e, "emb", Some("vec_id"), cents)
  .select(col("vec_id"), col("bucket").as("b1"))
setKnob(true)
val b = graft.operators.AnnIndex.ivfAssignHierarchical(e, "emb", Some("vec_id"), cents)
  .select(col("vec_id"), col("bucket").as("b2"))
val diff = a.join(b, Seq("vec_id")).filter(col("b1") =!= col("b2")).count()
println(s"[s10a] bucket mismatches plain-vs-bounded: $diff (MUST be 0)")
sys.exit(0)
