// Round-8 diagnostic: why did q60 (85.8s) and q89 (141s) spike on the WARM
// run at k=100 in scale_check8b while their second runs cost 1.9s / 11.2s?
// Hypotheses: (a) the spike is GC debt inherited from the preceding query's
// cached lineage, not the query's own cost -- test by running each shape
// FIRST in a fresh session, twice, with GC time printed per run; (b) q60's
// warm pays the minhashPairs lineage (8x md5 per shingle) whose stage split
// we time piecewise.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//   --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//   --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.shuffle.partitions=32 -i tools/prof_s8_q60q89.scala
import org.apache.spark.sql.functions._
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

spark.sparkContext.setLogLevel("ERROR")
def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
def timed(label: String)(f: => Long): Unit = {
  val g0 = gcMs; val t0 = System.nanoTime()
  val n = f
  println(f"[p8] $label%-28s rows=$n%9d wall=${(System.nanoTime() - t0) / 1e9}%7.2f s gc=${gcMs - g0}%6d ms")
}

val dir = "/tmp/scale8c/k100"

// q89 first, in a fresh session: does the warm spike reproduce without a
// predecessor query's heap debt?
timed("q89 run1 (fresh session)")(graft.operators.TextOps.bigramSurprisal(spark, dir).count())
timed("q89 run2")(graft.operators.TextOps.bigramSurprisal(spark, dir).count())
spark.catalog.clearCache()

// q60 piecewise: shingle+minhash lineage vs pair join vs CC loop
timed("q60 pairs only run1")(graft.operators.DedupOps.minhashPairs(spark, dir).count())
timed("q60 pairs only run2")(graft.operators.DedupOps.minhashPairs(spark, dir).count())
timed("q60 full run1")(graft.operators.DedupOps.dedupClusters(spark, dir).count())
timed("q60 full run2")(graft.operators.DedupOps.dedupClusters(spark, dir).count())
spark.catalog.clearCache()
timed("q89 after q60 (debt probe)")(graft.operators.TextOps.bigramSurprisal(spark, dir).count())
sys.exit(0)
