// Profiling scratch: q60 dedupClusters end-to-end at sf0.1 (bench shape:
// warm run, then two timed runs with cache cleared between).
import org.apache.spark.sql.functions._

val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
}

spark.read.parquet(s"$dir/documents.parquet").count() // warm FS

for (rnd <- 1 to 3) {
  spark.catalog.clearCache()
  time(s"q60 run $rnd") { graft.operators.DedupOps.dedupClusters(spark, dir).collect() }
  spark.catalog.clearCache()
  time(s"q25 run $rnd") { graft.operators.DedupOps.minhashLsh(spark, dir).collect() }
}
sys.exit(0)
