// Round-16: settle q110_bm25_topk's cross-round drift (VERDICT r15 wrong
// #2, builder seed #2). q110 moved +0.40-0.45 s round-over-round twice,
// always inside the documented cross-window spread -- this tool gives it the
// q40 treatment: an isolated steady-state measurement whose ASSERTED band
// is a RATIO against the co-measured tokenize floor (the explode+groupBy
// pass that dominates q110's lineage), so box-window speed cancels and only
// a STRUCTURAL regression (a lost broadcast, an extra corpus pass, a global
// sort) can breach it.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/prof_s16_q110.scala
import org.apache.spark.sql.functions._
import graft.operators.{OpCache, TextOps}
spark.sparkContext.setLogLevel("ERROR")

val dir = "/root/testdata/sf0.1"
def drop(): Unit = {
  OpCache.releaseAll()
  TextOps.invalidateBm25RankCache()
  spark.catalog.clearCache(); System.gc()
}
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

// the tokenize floor: q110's first (and dominant) stage -- the same
// explode+groupBy docTermTable builds (replicated here; the table itself is
// operators-private), WITHOUT the BM25 df/dl joins, scoring, or top-k
def floor() = spark.read.parquet(s"$dir/documents.parquet")
  .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
  .groupBy("doc_id", "lang", "tok").agg(count(lit(1)).as("m"))
  .groupBy("doc_id").agg(sum("m").as("dl"))
  .agg(sum("dl")).collect()
def q110() = { assert(TextOps.bm25TopK(spark, dir).collect().length == 20) }

// JIT warm, discarded
floor(); drop(); q110(); drop()
val runs = (1 to 3).map { _ =>
  val f = time(floor()); drop()
  val q = time(q110()); drop()
  (f, q)
}
val f = runs.map(_._1).min
val q = runs.map(_._2).min
println(f"MARKER q110_floor_sec=$f%.3f q110_sec=$q%.3f ratio=${q / f}%.2f")
// band: on top of the floor's single pass, q110 MATERIALIZES the persisted
// doc-term cache (scan + explode + agg + cache write) and re-reads it for
// dl / tot / hits, then the broadcast joins + per-doc aggregate + 20-row
// TakeOrdered -- measured 3.0-3.3x the floor (r16 calibration: 1.91 s vs
// 0.60 s). A structural regression adds at least one more floor-unit
// (second tokenize pass ~ +1.0x; lost broadcast -> 7M-row SMJ ~ +2x),
// landing >= 4.2x.
assert(q / f <= 4.2, f"q110 structural regression: ${q / f}%.2f x the tokenize floor")
println("MARKER q110_pin=OK")
sys.exit(0)
