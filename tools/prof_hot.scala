// Profiling scratch: repeat-time q25/q12/q09 exactly as Bench runs them.
val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
val qs = Seq("q60_dedup_clusters")
for (name <- qs) {
  val fn = graft.SparkEntry.queries(name)
  fn(spark, dir).count() // warm (codegen compile)
  spark.catalog.clearCache()
  val times = (1 to 4).map { _ =>
    val t0 = System.nanoTime(); fn(spark, dir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache(); dt
  }
  println(f"[prof] $name%-26s ${times.map(t => f"$t%.3f").mkString(" ")} min=${times.min}%.3f")
}
sys.exit(0)
