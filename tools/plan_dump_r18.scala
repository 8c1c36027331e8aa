// Dump .explain("formatted") for the round-17 optimization targets into
// plans/r18/<query>_<suffix>.txt (suffix from SPARK_GRAFT_PLAN_SUFFIX,
// default "before"). Run after `sbt package`:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --conf spark.sql.shuffle.partitions=32 -i tools/plan_dump_r17.scala
import java.nio.file.{Files, Paths}
val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
val targets = sys.env.get("SPARK_GRAFT_PLAN_ONLY").map(_.split(',').toSet)
val outDir = Paths.get("plans/r18")
Files.createDirectories(outDir)
graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
  if (targets.forall(_.contains(name))) {
    try {
      val df = fn(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plan] $name -> ${name}_$suffix.txt")
    } catch { case e: Throwable => println(s"[plan] $name FAILED: ${e.getMessage}") }
    graft.operators.OpCache.releaseAll()
    graft.operators.DedupOps.invalidateClusterCache()
    graft.operators.TextOps.invalidateBm25RankCache()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
System.exit(0)
