package graft

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.SparkSession

import graft.format.WhisperWriter
import graft.format.WhisperWriter.{ArchiveSpec, FileSpec}
import graft.sources.whisper.WhisperManifest

/**
 * Measurement harness for the remote-storage planning envelope
 * (VERDICT r11 #1, r12 #1): times whisper planning over a [[SlowFs]] tree at
 * object-store-class per-operation latencies, direct vs manifest-backed vs
 * sharded — and, since r13, under PAGED listings (S3-class stores return
 * ~1000 entries per LIST round trip, continuation tokens serial), so the
 * walk cost model is measured, not extrapolated. Results land in
 * BENCH_NOTES (r12 baseline table, r13 paged-LIST table).
 *
 * Run: sbt "Test/runMain graft.LatencyProbe [nFiles...]"
 *      (sizes >= 100k skip the direct header sweep and the 50 ms row to
 *      keep the run minutes, not hours — at 10 ms x 1M headers / 64-way
 *      pool the direct sweep alone is ~2.6 min and proves nothing new)
 */
object LatencyProbe {
  private val spec = FileSpec(archives = Seq(
    ArchiveSpec(10, 120, filled = 60, lastTimestamp = 1600000000L, rotation = 7)))

  private def mkTree(nDirs: Int, filesPerDir: Int): JPath = {
    import scala.collection.parallel.CollectionConverters._
    val tree = Files.createTempDirectory("latprobe")
    (0 until nDirs).par.foreach { d =>
      val sub = tree.resolve(s"svc$d")
      Files.createDirectories(sub)
      for (f <- 0 until filesPerDir) WhisperWriter.writeFile(sub.resolve(s"m$f.wsp"), spec)
    }
    tree
  }

  def main(args: Array[String]): Unit = {
    // "flat:N" args run ONLY the paged-LIST flat-directory section at size N
    // (uncapped) — the r14 walk-free-planning measurement at the 1M flat
    // prefix without paying a second 1M-file wide tree for the main section
    val flatSizes = args.collect { case s if s.startsWith("flat:") => s.drop(5).toInt }.toSeq
    val sizes =
      if (flatSizes.nonEmpty) Seq.empty[Int]
      else if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(1000, 10000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("latency-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.slowfs.impl", classOf[SlowFs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def planWall(pattern: String, opts: Map[String, String]): (Double, Long, Long, Long, Long) = {
      SlowFs.reset(SlowFs.latencyMs, SlowFs.listPageSize)
      val t0 = System.nanoTime()
      val r = opts.foldLeft(spark.read.format("whisper")) { case (a, (k, v)) => a.option(k, v) }
      r.load(pattern).rdd.getNumPartitions
      ((System.nanoTime() - t0) / 1e9,
        SlowFs.opens.get(), SlowFs.stats.get(), SlowFs.lists.get(), SlowFs.listPages.get())
    }
    def row(n: Int, lat: Long, mode: String, r: (Double, Long, Long, Long, Long)): Unit =
      println(f"$n%7d | $lat%3d | $mode%-10s | ${r._1}%8.2f | ${r._2}%7d | ${r._3}%7d | ${r._4}%6d | ${r._5}%6d")

    println("  files | lat | mode       |   wall_s |   opens |   stats |  lists |  pages")
    for (n <- sizes) {
      val big = n >= 100000
      val dirs = math.max(1, n / 100)
      val tree = mkTree(dirs, n / dirs)
      val pat = "slowfs:" + tree.toAbsolutePath + "/*"
      // JIT warm at zero latency (one-off per JVM, invariant in file count)
      SlowFs.latencyMs = 0; SlowFs.listPageSize = 1000
      planWall(pat, Map.empty)
      // the manifest itself lives ON the slow store so its own read (one
      // stat + one GET per load, memoized per version) is inside the billed
      // model — r13 open-surface #4
      val manifest = "slowfs:" + Files.createTempDirectory("latprobe-m")
        .resolve("m.jsonl.gz").toAbsolutePath
      WhisperManifest.write(Seq(pat), manifest)
      // manifestSpotCheck=0 below pins the r12 zero-opens planning floor the
      // cost model reasons about; the default (8) adds a constant <= 8 GETs
      val mOpts = Map("headerManifest" -> manifest, "manifestSpotCheck" -> "0")
      for (lat <- if (big) Seq(10L) else Seq(0L, 10L, 50L)) {
        SlowFs.latencyMs = lat
        if (!big) row(n, lat, "direct", planWall(pat, Map.empty))
        row(n, lat, "manifest", planWall(pat, mOpts))
        row(n, lat, "shard1/4", planWall(pat.stripSuffix("/*"), Map("streamShard" -> "0/4")))
        row(n, lat, "mani+shard", planWall(pat.stripSuffix("/*"),
          mOpts + ("streamShard" -> "0/4")))
      }
      // serial reference point at the small size only (it is the slow case)
      if (n <= 1000) {
        SlowFs.latencyMs = 10
        row(n, 10, "serial", planWall(pat, Map("planningParallelism" -> "1")))
      }
    }

    // ---- paged-LIST section (VERDICT r12 #1): FLAT directories are where
    // pagination bites — a directory of n entries costs ceil(n/page) SERIAL
    // round trips that no pool can hide (continuation tokens chain), so the
    // walk's residual floor on an S3-class store is set by the largest
    // single directory, not the tree size. Wide trees (the graphite shape,
    // ~100 entries/dir) never page at all at page=1000.
    println("\n  files | lat | shape/mode       |   wall_s |   opens |  lists |  pages | floor_s(pages*lat)")
    for (n <- (sizes.filter(_ <= 200000) ++ flatSizes)) {
      import scala.collection.parallel.CollectionConverters._
      val flat = Files.createTempDirectory("latprobe-flat")
      (0 until n).par.foreach(f => WhisperWriter.writeFile(flat.resolve(s"m$f.wsp"), spec))
      val pat = "slowfs:" + flat.toAbsolutePath + "/*"
      SlowFs.latencyMs = 0; SlowFs.listPageSize = 1000
      planWall(pat, Map.empty) // warm
      val manifest = Files.createTempDirectory("latprobe-fm").resolve("m.jsonl.gz").toString
      WhisperManifest.write(Seq(pat), manifest)
      // sharded manifest files for the r15 rows (written at zero latency —
      // the write's header sweep is not what these rows measure)
      val nSh = 4
      WhisperManifest.write(Seq(pat), manifest, shards = nSh)
      val mOpts = Map("headerManifest" -> manifest, "manifestSpotCheck" -> "0")
      for (page <- Seq(1000)) {
        SlowFs.latencyMs = 10; SlowFs.listPageSize = page
        if (n < 100000) { // the 1M direct sweep is ~156 s of naps and proves nothing new
          val d = planWall(pat, Map.empty)
          println(f"$n%7d |  10 | flat/direct      | ${d._1}%8.2f | ${d._2}%7d | ${d._4}%6d | ${d._5}%6d | ${d._5 * 10 / 1000.0}%6.2f")
        }
        val m = planWall(pat, mOpts)
        println(f"$n%7d |  10 | flat/manifest    | ${m._1}%8.2f | ${m._2}%7d | ${m._4}%6d | ${m._5}%6d | ${m._5 * 10 / 1000.0}%6.2f")
        // sharding a FLAT dir cannot prune the listing (every shard lists
        // the whole directory; only header reads split) — measured so the
        // operational guidance ("shard by subtree" needs subtrees) is pinned
        val s = planWall(pat.stripSuffix("/*"), mOpts + ("streamShard" -> "0/4"))
        println(f"$n%7d |  10 | flat/mani+shard  | ${s._1}%8.2f | ${s._2}%7d | ${s._4}%6d | ${s._5}%6d | ${s._5 * 10 / 1000.0}%6.2f")
        // walk-free planning (r14, VERDICT r13 #1): the file list comes
        // FROM the manifest; the store pays ONE bounded reconcile page
        // (manifestReconcileFiles=1000 at page=1000) instead of
        // ceil(n/page) serial pages — the flat-prefix plan floor becomes
        // the manifest parse
        val ml = planWall(pat.stripSuffix("/*"), mOpts + ("manifestListing" -> "true"))
        println(f"$n%7d |  10 | flat/maniList    | ${ml._1}%8.2f | ${ml._2}%7d | ${ml._4}%6d | ${ml._5}%6d | ${ml._5 * 10 / 1000.0}%6.2f")
        // decomposition rows: (a) reconcile=0 — the pure walk-free plan
        // floor (memoized parse + bin-packing; ZERO store ops), separating
        // the SlowFs-local artifact that serving even ONE reconcile page
        // costs an eager local listStatus of the whole directory, which a
        // real object store does not do; (b) a forced FRESH parse (mtime
        // bump invalidates the (len, mtime) memo) — the manifest gz parse
        // itself, the true cold-plan floor the r13 verdict asked to pin
        val m0 = planWall(pat.stripSuffix("/*"),
          mOpts + ("manifestListing" -> "true", "manifestReconcileFiles" -> "0"))
        println(f"$n%7d |  10 | flat/maniList-r0 | ${m0._1}%8.2f | ${m0._2}%7d | ${m0._4}%6d | ${m0._5}%6d | ${m0._5 * 10 / 1000.0}%6.2f")
        java.nio.file.Files.setLastModifiedTime(java.nio.file.Paths.get(manifest),
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
        val mf = planWall(pat.stripSuffix("/*"),
          mOpts + ("manifestListing" -> "true", "manifestReconcileFiles" -> "0"))
        println(f"$n%7d |  10 | flat/maniList-cold | ${mf._1}%6.2f | ${mf._2}%7d | ${mf._4}%6d | ${mf._5}%6d | ${mf._5 * 10 / 1000.0}%6.2f")

        // STREAMING tail rows (r15, VERDICT r14 missing #1): the tail pays
        // planning EVERY trigger, so the flat-prefix walk is at its worst
        // here — ceil(n/page) SERIAL pages per micro-batch that streamShard
        // cannot prune (a flat dir has no subtrees to split). Both rows get
        // the header manifest (headers were never the per-trigger cost —
        // the stream's own metaCache serves them from trigger 2 on); the
        // difference is the LISTING: walk mode re-pages the directory per
        // trigger, manifestListing serves the list from the memoized parse
        // plus ONE bounded reconcile page. Timed: a steady-state trigger
        // (the second planned window; the first warmed the caches).
        def streamTrigger(extra: Map[String, String]): (Double, Long, Long, Long, Long) = {
          import org.apache.spark.sql.util.CaseInsensitiveStringMap
          import graft.sources.whisper.{WhisperMicroBatchStream, WhisperOffset, WhisperOptions}
          val hm = new java.util.HashMap[String, String]()
          (mOpts ++ extra).foreach { case (k, v) => hm.put(k, v) }
          val o = WhisperOptions(new CaseInsensitiveStringMap(hm))
          val st = new WhisperMicroBatchStream(
            Seq(pat.stripSuffix("/*")), o, Seq.empty, o.schema, 0L)
          st.planInputPartitions(WhisperOffset(1599999000L), WhisperOffset(1599999500L))
          SlowFs.reset(SlowFs.latencyMs, SlowFs.listPageSize)
          val t0 = System.nanoTime()
          st.planInputPartitions(WhisperOffset(1599999500L), WhisperOffset(1600000000L))
          ((System.nanoTime() - t0) / 1e9,
            SlowFs.opens.get(), SlowFs.stats.get(), SlowFs.lists.get(), SlowFs.listPages.get())
        }
        val sw = streamTrigger(Map.empty)
        println(f"$n%7d |  10 | flat/stream-walk | ${sw._1}%8.2f | ${sw._2}%7d | ${sw._4}%6d | ${sw._5}%6d | ${sw._5 * 10 / 1000.0}%6.2f")
        val sm = streamTrigger(Map("manifestListing" -> "true"))
        println(f"$n%7d |  10 | flat/stream-mani | ${sm._1}%8.2f | ${sm._2}%7d | ${sm._4}%6d | ${sm._5}%6d | ${sm._5 * 10 / 1000.0}%6.2f")

        // SHARDED-manifest rows (r15, VERDICT r14 missing #2): with the
        // manifest file itself split n-ways by entry-path hash, each shard
        // stream parses, memoizes, and bin-packs 1/n of the entries — the
        // residual warm floor (partition construction over the entry list,
        // BENCH_NOTES r14 addendum 2) splits with it. cold = first load of
        // shard 0's file this JVM (fresh gz parse); warm = memoized parse.
        // reconcile=0 isolates the plan floor from the SlowFs-local eager-
        // list artifact, as in the maniList-r0 row above.
        val shOpts = mOpts + ("manifestListing" -> "true",
          "streamShard" -> s"0/$nSh", "manifestReconcileFiles" -> "0")
        val shc = planWall(pat.stripSuffix("/*"), shOpts)
        println(f"$n%7d |  10 | flat/maniList-sh-cold | ${shc._1}%4.2f | ${shc._2}%7d | ${shc._4}%6d | ${shc._5}%6d | ${shc._5 * 10 / 1000.0}%6.2f")
        val shw = planWall(pat.stripSuffix("/*"), shOpts)
        println(f"$n%7d |  10 | flat/maniList-sh-warm | ${shw._1}%4.2f | ${shw._2}%7d | ${shw._4}%6d | ${shw._5}%6d | ${shw._5 * 10 / 1000.0}%6.2f")
        val ss = streamTrigger(Map("manifestListing" -> "true", "streamShard" -> s"0/$nSh"))
        println(f"$n%7d |  10 | flat/stream-mani-sh | ${ss._1}%6.2f | ${ss._2}%7d | ${ss._4}%6d | ${ss._5}%6d | ${ss._5 * 10 / 1000.0}%6.2f")
        // reconcile=0 decomposition for the STREAM rows, mirroring the
        // maniList-r0 batch row: SlowFs's reconcile page eagerly lists the
        // whole local directory (an artifact a real object store's bounded
        // LIST does not pay), so these rows show the true steady-state
        // trigger floor — the memoized parse + bin-packing, zero store ops
        val s0 = streamTrigger(Map("manifestListing" -> "true", "manifestReconcileFiles" -> "0"))
        println(f"$n%7d |  10 | flat/stream-mani-r0 | ${s0._1}%6.2f | ${s0._2}%7d | ${s0._4}%6d | ${s0._5}%6d | ${s0._5 * 10 / 1000.0}%6.2f")
        val s0s = streamTrigger(Map("manifestListing" -> "true",
          "streamShard" -> s"0/$nSh", "manifestReconcileFiles" -> "0"))
        println(f"$n%7d |  10 | flat/stream-mani-sh-r0 | ${s0s._1}%3.2f | ${s0s._2}%7d | ${s0s._4}%6d | ${s0s._5}%6d | ${s0s._5 * 10 / 1000.0}%6.2f")
      }
    }
    spark.stop()
  }
}
