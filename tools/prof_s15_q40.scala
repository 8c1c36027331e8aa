// Round-15: pin the q40 parse-after-aggregate win in isolation (VERDICT r14
// watch #3). Under the bench protocol the two shapes time identically (the
// protocol wall is the first-touch scan), so the r14 rewrite's benefit is
// invisible there and could silently regress. This tool regenerates the
// isolated steady-state measurement (JIT-warm, page-cache-warm, min of 3)
// at ~10M rows and ASSERTS the pinned band: the aggregate-first shape must
// stay >= 2.5x faster than the per-row-parse shape (r14 measured ~6x:
// 0.5 s vs 3.0 s).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/prof_s15_q40.scala
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")

val out = "/tmp/graft_q40_events"
if (!new java.io.File(out + "/_SUCCESS").exists) {
  // ~10M-row replica of the sf0.1 events (props, value) projection; props
  // stays byte-identical per the replication-law rule (dictionary-shaped
  // JSON is exactly what parse-after-aggregate exploits, and exactly the
  // real tracking-event shape), value unchanged.
  val src = spark.read.parquet("/root/testdata/sf0.1/events.parquet").select("props", "value")
  val reps = math.max(1, math.ceil(10000000.0 / src.count()).toInt)
  spark.range(reps).crossJoin(src)
    .select("props", "value")
    .repartition(32)
    .write.mode("overwrite").parquet(out)
}
val ev = spark.read.parquet(out)
println("MARKER rows=" + ev.count())

// the SHIPPED shape (RelationalOps.jsonExtract): aggregate raw props first,
// parse only distinct survivors, re-aggregate on the extracted key
def shapeAgg() = ev.groupBy(col("props"))
  .agg(count(lit(1)).as("n0"), sum(col("value")).as("t0"))
  .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"), col("n0"), col("t0"))
  .groupBy(col("k")).agg(sum("n0").as("n"), round(sum(col("t0")), 2).as("total"))
  .orderBy("k")
// the pre-r14 shape: one Jackson parse per row
def shapeRow() = ev
  .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"), col("value"))
  .groupBy(col("k")).agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
  .orderBy("k")

def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
// results identical (the rewrite is an equivalence, different raw strings
// encoding the same k re-merge in the second aggregate)
assert(shapeAgg().collect().toSeq == shapeRow().collect().toSeq, "shapes disagree")
// steady state: both warmed above; min of 3 interleaved
val runs = (1 to 3).map(_ => (time(shapeAgg().collect()), time(shapeRow().collect())))
val a = runs.map(_._1).min
val r = runs.map(_._2).min
println(f"MARKER q40_parse_after_agg_sec=$a%.3f q40_per_row_parse_sec=$r%.3f ratio=${r / a}%.2f")
assert(r / a >= 2.5, f"q40 parse-after-aggregate win regressed: ratio ${r / a}%.2f < 2.5")
println("MARKER q40_pin=OK")
sys.exit(0)
