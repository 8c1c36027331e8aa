// Round-14: build an sf10-EQUIVALENT corpus (100x sf0.1) at /tmp/graft_sf10
// with the same semantics-preserving replication laws as
// tools/scale_sf1_build.scala, so the r13 crossover extrapolation ("ratios
// halve roughly every 10x") can be VALIDATED at 100x instead of extrapolated
// from 10x (VERDICT r13 next-round #4). Laws:
//  - documents: per-replica substitution cipher (length-preserving,
//    bijective gram space)
//  - embeddings: per-replica signed dimension rotation (orthogonal)
//  - relational: every key column k*100+r (FK-consistent within a replica)
//  - events: user_id*100+r, ts unchanged
// Replicas are written in batches of 10 unioned frames per append so the
// build is ~10 write jobs per table, not 100.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_sf10_build.scala
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("ERROR")
val src0 = "/root/testdata/sf0.1"
val dst = "/tmp/graft_sf10"
val K = 100
val BATCH = 10

val lower = "abcdefghijklmnopqrstuvwxyz"
val upper = lower.toUpperCase
val digit = "0123456789"
val csrc = lower + upper + digit
def cipher(r: Int): String = {
  def perm(s: String, seed: Int): String =
    new scala.util.Random(seed).shuffle(s.toList).mkString
  if (r == 0) csrc
  else perm(lower, 1000 + r) + perm(upper, 3000 + r) + perm(digit, 5000 + r)
}

def writeReplicas(table: String)(f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit = {
  val base = spark.read.parquet(s"$src0/$table.parquet")
  val t0 = System.nanoTime()
  (0 until K).grouped(BATCH).zipWithIndex.foreach { case (rs, b) =>
    rs.map(r => f(base, r)).reduce(_ unionAll _)
      .write.mode(if (b == 0) "overwrite" else "append")
      .parquet(s"$dst/$table.parquet")
  }
  val n = spark.read.parquet(s"$dst/$table.parquet").count()
  println(f"MARKER_built $table rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
}

if (!new java.io.File(s"$dst/_DONE").exists) {
  writeReplicas("documents") { (d, r) =>
    d.select((col("doc_id") * K + lit(r)).as("doc_id"),
      translate(col("text"), csrc, cipher(r)).as("text"),
      col("lang"), col("source"), col("n_chars"))
  }
  writeReplicas("embeddings") { (d, r) =>
    val sign = if (r % 2 == 1) "* cast(if(j % 2 = 1, -1.0, 1.0) as float)" else ""
    d.select((col("vec_id") * K + lit(r)).as("vec_id"),
      expr(s"transform(sequence(0, 63), j -> embedding[(j + ${r % 64}) % 64] $sign)").as("embedding"),
      col("label"))
  }
  writeReplicas("region") { (d, r) =>
    d.select((col("r_regionkey") * K + lit(r)).as("r_regionkey"), col("r_name")) }
  writeReplicas("nation") { (d, r) =>
    d.select((col("n_nationkey") * K + lit(r)).as("n_nationkey"), col("n_name"),
      (col("n_regionkey") * K + lit(r)).as("n_regionkey")) }
  writeReplicas("customer") { (d, r) =>
    d.select((col("c_custkey") * K + lit(r)).as("c_custkey"), col("c_name"),
      (col("c_nationkey") * K + lit(r)).as("c_nationkey"), col("c_acctbal"), col("c_mktsegment")) }
  writeReplicas("supplier") { (d, r) =>
    d.select((col("s_suppkey") * K + lit(r)).as("s_suppkey"), col("s_name"),
      (col("s_nationkey") * K + lit(r)).as("s_nationkey"), col("s_acctbal")) }
  writeReplicas("part") { (d, r) =>
    d.select((col("p_partkey") * K + lit(r)).as("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")) }
  writeReplicas("orders") { (d, r) =>
    d.select((col("o_orderkey") * K + lit(r)).as("o_orderkey"),
      (col("o_custkey") * K + lit(r)).as("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")) }
  writeReplicas("lineitem") { (d, r) =>
    d.select((col("l_orderkey") * K + lit(r)).as("l_orderkey"),
      (col("l_partkey") * K + lit(r)).as("l_partkey"),
      (col("l_suppkey") * K + lit(r)).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate")) }
  writeReplicas("events") { (d, r) =>
    d.select((col("event_id") * K + lit(r)).as("event_id"), col("ts"),
      (col("user_id") * K + lit(r)).as("user_id"), col("event_type"), col("value"), col("props")) }
  new java.io.File(s"$dst/_DONE").createNewFile()
}
println("MARKER sf10 build done")
sys.exit(0)
