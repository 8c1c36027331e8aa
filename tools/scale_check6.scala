// q60 CC round-count bench (VERDICT r5 item 7): adversarial LONG-CHAIN
// graphs -- the worst case for min-label propagation (rounds = diameter) and
// the case large-star/small-star exists for (O(log^2 n) rounds on any
// graph). Chains of length 10k/30k/100k (1x/3x/10x). Rounds come from the
// algorithm itself (connectedComponentsStarWithRounds): a SparkListener job
// count is NOT a round count -- under AQE one fixpoint action spawns a job
// per materialized exchange stage (5-8 for this plan), which is how round 6's
// first attempt misread ~20 rounds as ~140.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   -i tools/scale_check6.scala 2>/dev/null | grep '^\[cc\]'
import org.apache.spark.sql.functions._

def chainBench(n: Long): Unit = {
  val edges = spark.range(0L, n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
  // warm the input so the timed section is the CC loop, not the range
  edges.count()
  val t0 = System.nanoTime()
  val (labels, rounds) = graft.operators.DedupOps.connectedComponentsStarWithRounds(edges)
  val bad = labels.filter(col("lbl") =!= 0L).count() // one chain => all labels 0
  val wall = (System.nanoTime() - t0) / 1e9
  println(f"[cc] chain n=$n%7d rounds=$rounds%2d wall=$wall%6.2f s correct=${bad == 0}")
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
}

for (n <- Seq(10000L, 30000L, 100000L)) chainBench(n)

// the production q60 shape for reference: LSH pair graph at sf0.01
val t0 = System.nanoTime()
val q60 = graft.SparkEntry.queries("q60_dedup_clusters")(spark, "/root/testdata/sf0.01")
val rows = q60.count()
println(f"[cc] q60 sf0.01 rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
sys.exit(0)
