// Scaling check 5 (round 5): three claims measured.
//
// A. q93 ExactSubstr with hashed gram keys is flat-to-linear at 1x/3x/10x
//    rows (the r5 kernel path: gram_hash20 in-row, 8-byte shuffle keys).
// B. Skew injection: plant one hot 20-gram in 30 percent of documents and
//    show the gram-keyed operators stay bounded. Why each survives:
//      q93 incidence count -- partial aggregation: each map task combines
//        the hot key to ONE row before the exchange, so the reduce side of
//        the count sees at most #tasks rows for the hot gram;
//      q93 hit join -- the dup-gram relation is duplicate-grams-only, tiny
//        here (broadcast); at corpus scale it becomes an SMJ whose hot
//        partition AQE skew-split divides (skewJoin config asserted on in
//        PlanGuardSpec);
//      q26 ngram-jaccard pair join -- the df<=50 pruning DROPS any shingle
//        shared by more docs than the cap BEFORE the self-join, so a hot
//        shingle never reaches the quadratic stage (same guard: q61/q70
//        decontamination shingles).
// C. Whisper source at 10x ref-scale: ten 82.8 MB ref-shape files under one
//    directory; the scan parallelizes per (file, archive) -- 30 partitions
//    vs the single file's 3 -- so wall time grows far sublinearly in bytes.
//    gzip limitation: a .wsp.gz is one stream, so a gzipped file cannot be
//    split below file granularity (documented here, asserted in
//    WhisperSourceSpec gzip tests).
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.extensions=graft.GraftExtensions \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check5.scala
import org.apache.spark.sql.functions._

spark.conf.set("spark.sql.adaptive.enabled", "true")
println(s"[cfg] adaptive=${spark.conf.get("spark.sql.adaptive.enabled")} " +
  s"skewJoin=${spark.conf.get("spark.sql.adaptive.skewJoin.enabled")}")

val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

def timeIt[T](f: => T): (Double, T) = {
  val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
}

// ---------- A: q93 at 1x/3x/10x ----------
def mkScale(k: Int): String = {
  val dir = s"/tmp/graft_scl5_$k"
  (0 until k).map { i =>
    docsBase.select(
      (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
      if (i == 0) col("text") else concat(col("text"), lit(s" v$i")).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  dir
}
for (k <- Seq(1, 3, 10)) {
  val dir = mkScale(k)
  graft.operators.DedupOps.substringDup(spark, dir).count() // warm
  val (t, n) = timeIt(graft.operators.DedupOps.substringDup(spark, dir).count())
  println(f"[q93-scale] ${k}x rows=$n wall=$t%.2f s")
  spark.catalog.clearCache()
}

// ---------- B: hot-gram skew injection ----------
// One fixed 39-char suffix => 20 identical 20-grams per tagged doc, tagged
// on 30 percent of documents: the hot gram appears in 30 percent of docs.
def mkSkew(base: String, tag: Boolean): String = {
  val dir = s"/tmp/graft_scl5_skew_${tag}"
  val d = spark.read.parquet(s"$base/documents.parquet")
  val out =
    if (!tag) d
    else d.withColumn("text",
      when(col("doc_id") % 10 < 3, concat(col("text"), lit(" ZZHOTGRAMZZHOTGRAMZZHOTGRAMZZHOTGRAMZZ")))
        .otherwise(col("text")))
  out.write.mode("overwrite").parquet(s"$dir/documents.parquet")
  dir
}
val base10 = "/tmp/graft_scl5_10"
for (tag <- Seq(false, true)) {
  val dir = mkSkew(base10, tag)
  for ((name, fn) <- Seq(
    "q93_substring_dup" -> ((d: String) => graft.operators.DedupOps.substringDup(spark, d)),
    "q26_ngram_jaccard" -> ((d: String) => graft.operators.DedupOps.ngramJaccard(spark, d)),
    "q61_decontaminate" -> ((d: String) => graft.operators.SamplingOps.decontaminate(spark, d)))) {
    fn(dir).count() // warm
    val (t, n) = timeIt(fn(dir).count())
    println(f"[skew] hot=$tag $name rows=$n wall=$t%.2f s")
    spark.catalog.clearCache()
  }
}

// ---------- B2: force the SMJ path and PROVE AQE skew-split engages ----------
// Locally the dup-gram side is tiny, so the hot-key join resolves to a
// broadcast (no skew exposure). At 100 TB it is an SMJ; emulate that by
// disabling broadcast and lowering the skew thresholds to local data sizes,
// then read the final AQE plan for the skew marker.
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
val dirHot = "/tmp/graft_scl5_skew_true"
val dfSmj = graft.operators.DedupOps.substringDup(spark, dirHot)
val (tSmj, nSmj) = timeIt(dfSmj.count())
val planSmj = dfSmj.queryExecution.executedPlan.toString
val skewEngaged = planSmj.toLowerCase.contains("skew")
println(f"[skew-smj] forced-SMJ hot-gram run: rows=$nSmj wall=$tSmj%.2f s skew_split_engaged=$skewEngaged")
spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
spark.catalog.clearCache()

// ---------- C: whisper at 10x ref-scale ----------
val multiDir = java.nio.file.Paths.get("/tmp/graft_ref10")
java.nio.file.Files.createDirectories(multiDir)
val single = graft.operators.WhisperWorkload.refScaleFixture()
for (i <- 0 until 10) {
  val p = multiDir.resolve(s"f$i.wsp")
  if (!java.nio.file.Files.exists(p) ||
      java.nio.file.Files.size(p) != graft.operators.WhisperWorkload.RefScaleBytes)
    java.nio.file.Files.copy(single, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
}
def scanRows(path: String): Long =
  spark.read.format("whisper").load(path).groupBy("archive").count()
    .collect().map(_.getLong(1)).sum
scanRows(single.toString) // warm
val (t1, n1) = timeIt(scanRows(single.toString))
val (t10, n10) = timeIt(scanRows(multiDir.toString))
val p1 = spark.read.format("whisper").load(single.toString).rdd.getNumPartitions
val p10 = spark.read.format("whisper").load(multiDir.toString).rdd.getNumPartitions
println(f"[whisper-10x] single: rows=$n1 parts=$p1 wall=$t1%.2f s; " +
  f"10-file: rows=$n10 parts=$p10 wall=$t10%.2f s; bytes 10x, wall ${t10 / t1}%.1fx")
sys.exit(0)
