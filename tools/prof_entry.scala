// Time selected SparkEntry queries exactly as Bench does (clearCache, then count).
val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
val names = sys.env.getOrElse("PROF_QUERIES", "q25_dedup_minhash_lsh,q26_dedup_ngram_jaccard,q43_curation_pipeline").split(",")
for (n <- names) {
  val fn = graft.SparkEntry.queries(n)
  for (rnd <- 1 to 2) {
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    println(f"[prof] $n run$rnd ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }
}
sys.exit(0)
