// Stage decomposition of q128_crossmodal_dedup (r18): where do the ~4.5 s
// go -- text-leg label build, fused edge build, propagation loop, election?
// Run after `sbt package`:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /opt/spark/bin/spark-shell \
//     --master 'local[32]' --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --conf spark.sql.shuffle.partitions=32 -i tools/prof_s18_q128.scala
import org.apache.spark.sql.functions._
val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
def drop(): Unit = {
  graft.operators.OpCache.releaseAll()
  graft.operators.DedupOps.invalidateClusterCache()
  graft.operators.TextOps.invalidateBm25RankCache()
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
}
def time[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime(); val r = f
  println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
  r
}
def noop(df: org.apache.spark.sql.DataFrame): Unit =
  df.write.format("noop").mode("overwrite").save()

// warm: fixtures + codegen
graft.SparkEntry.queries("q128_crossmodal_dedup")(spark, dir).count()
drop()

for (round <- 1 to 2) {
  println(s"== round $round")
  spark.sparkContext.setJobDescription("q128 prof: text label build")
  time("text labels (q60 lineage)") {
    graft.operators.DedupOps.dedupClusters(spark, dir).count()
  }
  spark.sparkContext.setJobDescription("q128 prof: fused modal edges")
  time("crossModalPairEdges noop") {
    // private[operators] is public in bytecode -- reflect
    val m = graft.operators.MultimodalOps.getClass.getMethod(
      "crossModalPairEdges", classOf[org.apache.spark.sql.SparkSession], classOf[String])
    noop(m.invoke(graft.operators.MultimodalOps, spark, dir)
      .asInstanceOf[org.apache.spark.sql.DataFrame])
  }
  drop()
  spark.sparkContext.setJobDescription("q128 prof: full q128")
  time("full q128 count") {
    graft.SparkEntry.queries("q128_crossmodal_dedup")(spark, dir).count()
  }
  drop()
  spark.sparkContext.setJobDescription(null)
}
System.exit(0)
