// Round-10 probe (VERDICT r9 #2): A/B the streaming replays' state-store
// provider. q104's adjudicated floor is 59.7 s of cumulative HDFS-backed
// store commit on a zero-input trigger; Spark ships RocksDB (+ changelog
// checkpointing) to cut exactly this. Runs the four replays at sf0.1 under
//   A) default HDFSBackedStateStoreProvider
//   B) RocksDBStateStoreProvider
//   C) RocksDB + changelog checkpointing
// warm run discarded, min-of-2, state dropped between runs; result rows are
// md5-hashed per replay to prove provider-independence of output.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//   --conf spark.sql.extensions=graft.GraftExtensions \
//   --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC -i tools/prof_s10_rocksdb.scala
import org.apache.spark.sql.functions._

val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val names = graft.SparkEntry.queries.keys.toSeq.sorted.filter(_.contains("_stream_"))

def dropState(): Unit = {
  spark.catalog.clearCache()
  spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
}

def resultHash(name: String): String = {
  val df = graft.SparkEntry.queries(name)(spark, dir)
  val cols = df.columns.sorted.map(c => col(c).cast("string"))
  df.select(md5(concat_ws("|", cols: _*)).as("h"))
    .agg(sum(conv(substring(col("h"), 1, 12), 16, 10).cast("decimal(38,0)")).cast("string"),
         count(lit(1)).cast("string"))
    .head().toSeq.mkString(":")
}

def timeOne(name: String): Double = {
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, dir).count()
  val dt = (System.nanoTime() - t0) / 1e9
  dropState(); dt
}

case class Cfg(tag: String, provider: Option[String], changelog: Boolean)
val cfgs = Seq(
  Cfg("hdfs-default", None, false),
  Cfg("rocksdb", Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), false),
  Cfg("rocksdb+changelog", Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"), true)
)

val out = scala.collection.mutable.ArrayBuffer[String]()
val hashes = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]()
for (c <- cfgs) {
  c.provider match {
    case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
    case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
  spark.conf.set("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", c.changelog.toString)
  for (n <- names) {
    try { timeOne(n) } catch { case e: Throwable => out += s"${c.tag} $n WARM-FAIL ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}" }
    val xs = (1 to 2).map(_ => timeOne(n))
    val h = resultHash(n); dropState()
    hashes.getOrElseUpdate(n, scala.collection.mutable.Map()) += (c.tag -> h)
    out += f"${c.tag}%-18s $n%-28s min=${xs.min}%6.2f s  runs=${xs.map(x => f"$x%.2f").mkString("/")}  hash=$h"
  }
}
println("==== RESULTS ====")
out.foreach(println)
println("==== HASH CHECK ====")
for (n <- names) {
  val hs = hashes(n).values.toSet
  println(s"$n providers-agree=${hs.size == 1}")
}
sys.exit(0)
