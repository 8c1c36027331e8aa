// Round-7 scaling check: the four slope-flagged queries (q12, q35, q48,
// q84 -- see tools/ratio_analysis.py and BENCH_NOTES round 7) re-timed on
// 1x/3x/10x replicas of their sf0.1 inputs. The claim under test: Spark's
// wall is floor + c*rows with small constant c (linear, no superlinear
// term), so the sf0.1 Spark-vs-DuckDB gap is the fixed stage floor that a
// 100 TB run amortizes, not a per-row deficit that it magnifies.
//
// Replication perturbs the JOIN KEYS (orderkey*k + r) so key cardinality
// scales with the data and join/group fan-in per key stays constant -- a
// plain union of identical copies would multiply rows-per-key instead,
// which is a different (skew) experiment.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//   --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.shuffle.partitions=32 -i tools/scale_check7.scala \
//   2>/dev/null | grep '^\[s7\]'
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

val dir = "/root/testdata/sf0.1"
def rep(df: DataFrame, k: Int, keyCols: Seq[String]): DataFrame = {
  val e = df.withColumn("__r", explode(sequence(lit(0), lit(k - 1))))
  keyCols.foldLeft(e)((d, c) => d.withColumn(c, col(c) * k + col("__r"))).drop("__r")
}

def time(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def best(n: Int)(f: => Long): Double = { f; (1 to n).map(_ => time(f)).min } // warm + min

val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
val or0 = spark.read.parquet(s"$dir/orders.parquet")
val cu0 = spark.read.parquet(s"$dir/customer.parquet")
val ev0 = spark.read.parquet(s"$dir/events.parquet")

for (k <- Seq(1, 3, 10)) {
  val li = rep(li0, k, Seq("l_orderkey")).localCheckpoint()
  val or = rep(or0, k, Seq("o_orderkey", "o_custkey")).localCheckpoint()
  val cu = rep(cu0, k, Seq("c_custkey")).localCheckpoint()
  val nli = li.count()

  // q12 shape: filtered 3-table join -> group -> top-10
  val t12 = best(3) {
    cu.filter(col("c_mktsegment") === "BUILDING")
      .join(or, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")) &&
              col("l_shipdate") > to_timestamp(lit("1997-01-01")))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("rev").desc, col("o_orderkey")).limit(10).count()
  }

  // q35 shape: pre-aggregated existence join
  val t35 = best(3) {
    val maxShip = li.groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("ms"))
    or.join(maxShip, col("l_orderkey") === col("o_orderkey"))
      .filter(col("ms") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority").agg(count(lit(1))).count()
  }
  println(f"[s7] k=$k%2d lineitem_rows=$nli%8d q12=$t12%6.3f s q35=$t35%6.3f s")
  Seq(li, or, cu).foreach(_.unpersist(false))
}

// q48 shape: the two-pass distributed decile (range repartition ->
// per-partition window -> O(partitions) offsets -> tile arithmetic),
// inlined from RelationalOps.decileHistogram on replicated orders
import org.apache.spark.sql.expressions.Window
for (k <- Seq(1, 3, 10)) {
  val or = rep(or0, k, Seq("o_orderkey")).localCheckpoint()
  val n0 = or.count()
  // track the per-iteration checkpoint so cleanup never touches the outer
  // replicated input (unpersisting a localCheckpoint makes it unrecoverable
  // -- its lineage is truncated by design)
  var inner: DataFrame = null
  val t48 = best(3) {
    val orders = or.select(col("o_orderkey"), col("o_totalprice"))
      .repartitionByRange(col("o_totalprice"), col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts = orders.groupBy("pid").agg(count(lit(1)).as("pc"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val localW = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    val tq = n / 10; val tr = n % 10
    val decExpr =
      if (tq == 0L) "cast(rn as int)"
      else s"cast(if(rn <= ${(tq + 1) * tr}, (rn - 1) div ${tq + 1} + 1, " +
        s"$tr + (rn - ${(tq + 1) * tr} - 1) div $tq + 1) as int)"
    val out = orders.join(broadcast(offsetsDf), "pid")
      .withColumn("rn", col("offset") + row_number().over(localW))
      .withColumn("decile", expr(decExpr))
      .groupBy(col("decile")).agg(count(lit(1)).as("n")).count()
    if (inner != null) inner.unpersist(false)
    inner = orders
    out
  }
  if (inner != null) inner.unpersist(false)
  println(f"[s7] k=$k%2d orders_rows=$n0%8d q48=$t48%6.3f s")
  or.unpersist(false)
}
sys.exit(0)
