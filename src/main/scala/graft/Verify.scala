package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2 || args.length > 3) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [q1,q2,...]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    // optional comma-separated name filter: iterate on one query without
    // re-running all 100 (the driver always passes two args — full run)
    val only: Option[Set[String]] = args.lift(2).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER=local-cluster[2,16,4096] runs the whole gate under
    // a real driver/executor split (separate executor JVMs) — the closest
    // this sandbox gets to a cluster. Executor JVMs need the library on
    // their classpath, so the packaged jar ships via spark.jars
    // (SPARK_GRAFT_JARS; sbt-run classes are not visible to child JVMs).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions) // native functions + whisper plan rules
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(builder.config("spark.jars", _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // several operators persist intermediates for the duration of their
      // query; running all of them in one session must not accumulate 60+
      // cached plans (Bench clears between queries for the same reason)
      spark.catalog.clearCache()
    }
    // Trained PQ codebook (j, cw) for the q95/q99/q100 oracles: they read
    // it via the __GRAFT_VERIFY_OUT__ substitution below instead of each
    // replaying 4 Lloyd rounds in DuckDB SQL (q92's oracle still trains
    // from scratch, keeping the codebook independently verified). Written
    // to a SIBLING of outDir, not inside it: the driver treats every
    // outDir subdirectory as a query output, and a phantom rows-only
    // "pq_codebook" entry would pollute the correctness record.
    val auxDir = new java.io.File(outDir).getAbsolutePath + "_aux"
    try graft.operators.VectorOps.pqCodebookDf(spark, sfDir).foreach(
      _.coalesce(1).write.mode("overwrite").parquet(s"$auxDir/pq_codebook"))
    catch { case e: Throwable =>
      System.err.println(s"[verify] pq_codebook failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Oracle SQL may reference Verify-written parquet (the PQ codebook) by
    // absolute path — substituted here because only Verify knows outDir.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GRAFT_VERIFY_OUT__", auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
