// VERDICT r12 #7: measure the partition-identity pin's two modes --
// localCheckpoint (executor-memory blocks, die with their executor) vs
// reliable checkpoint() (written to the checkpoint dir, survives executor
// loss) -- on the two prefix-offset queries that use it (q55 sequencePack,
// q98 pretrainExport) at sf0.1. Protocol: 3 cache-cold JIT-warm runs per
// mode, min of the last 2 (round-8 probe protocol); modes bracketed
// local -> reliable -> local so box drift is visible.
// Run: spark-shell --master local[8] --jars <jar> -i tools/prof_s13_ckpt.scala
// NOTE (ADVICE r13): this loop is exactly the shape that LEAKS checkpoint
// dirs under reliable mode unless the session was built with
// spark.cleaner.referenceTracking.cleanCheckpoints=true (static conf --
// pass --conf on the spark-shell command line; a runtime set cannot help).
// dropState()'s System.gc() is what lets the cleaner reclaim them.
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.setCheckpointDir("/tmp/graft_ckpt_s13")
val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def dropState(): Unit = {
  graft.operators.OpCache.releaseAll()
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  System.gc()
}

def measure(tag: String, reliable: Boolean): Unit = {
  spark.conf.set("spark.graft.reliableCheckpoint", reliable.toString)
  for (q <- Seq("q55_pack", "q98_export")) {
    val walls = (0 until 3).map { _ =>
      dropState()
      val t0 = System.nanoTime()
      val df =
        if (q == "q55_pack") graft.operators.SamplingOps.sequencePack(spark, dir)
        else graft.operators.SamplingOps.pretrainExport(spark, dir)
      df.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"CKPT mode=$tag%-9s $q%-11s walls=${walls.map(w => f"$w%.2f").mkString(",")} min2=${walls.drop(1).min}%.2f")
  }
}

measure("local", false)
measure("reliable", true)
measure("local2", false)
spark.conf.set("spark.graft.reliableCheckpoint", "false")
println("CKPT done")
sys.exit(0)
