// Round-8 scaling check, part D: whisper DSv2 planning + scan at MANY
// FILES. Parts A-C scale rows; the 100 TB whisper reality scales FILE
// COUNT (a graphite tree is millions of small .wsp files). The planner
// reads each file's header (FileMetaSize + 12*archives bytes) to
// enumerate archive partitions -- this probe measures that per-file
// planning tax and the scan throughput at 20 / 200 / 2000 files, plus
// metadata-only access (describe_archives) which must NOT pay a data
// scan at any file count.
//
// Run (AFTER sbt package):
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 8g \
//     --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.shuffle.partitions=32 \
//     -i tools/scale_check8d.scala 2>/dev/null | grep -o '\[s8d\].*'
import java.nio.file.{Files, Paths}
import graft.format.WhisperWriter
import graft.format.WhisperWriter.{ArchiveSpec, FileSpec}
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("ERROR")

val spec = FileSpec(archives = Seq(
  ArchiveSpec(60, 1440, filled = 1440, lastTimestamp = 1600000000L, rotation = 97)))

def mkFiles(n: Int): String = {
  val dir = s"/tmp/wspmany/n$n"
  if (!Files.exists(Paths.get(s"$dir/_DONE"))) {
    (0 until n).foreach { i =>
      WhisperWriter.writeFile(Paths.get(f"$dir/m$i%05d.wsp"), spec)
    }
    Files.createFile(Paths.get(s"$dir/_DONE"))
  }
  dir
}

for (n <- Seq(20, 200, 2000)) {
  val dir = mkFiles(n)
  // planning: DataFrame construction + partition enumeration, no data read
  val tp0 = System.nanoTime()
  val df = spark.read.format("whisper").load(s"$dir/*.wsp")
  val parts = df.rdd.getNumPartitions
  val plan = (System.nanoTime() - tp0) / 1e9
  // full scan
  val ts0 = System.nanoTime()
  val rows = df.count()
  val scan = (System.nanoTime() - ts0) / 1e9
  val scan2 = { // second scan: planning caches vs re-list
    val t = System.nanoTime()
    spark.read.format("whisper").load(s"$dir/*.wsp").count()
    (System.nanoTime() - t) / 1e9
  }
  // metadata-only: one file's describe (header bytes only, any file count)
  val tm0 = System.nanoTime()
  graft.meta.WhisperMeta.describeArchives(spark, f"$dir/m00000.wsp").collect()
  val meta = (System.nanoTime() - tm0) / 1e9
  println(f"[s8d] files=$n%5d partitions=$parts%5d plan=$plan%6.2f s scan1=$scan%6.2f s " +
    f"scan2=$scan2%6.2f s rows=$rows%9d describe=$meta%5.2f s")
}
sys.exit(0)
