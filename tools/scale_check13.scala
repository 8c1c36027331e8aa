// Round-13 probe, three measurements on the 1M-file regime + a skewed tree.
//  1. Manifest refresh: full write vs --update after 1000 changed-length
//     rewrites + 500 new files (VERDICT r12 #2 "done" criterion: O(changed)
//     at the 1M tree, seconds vs the full rewrite).
//  2. Incremental export under the r13 EXACTLY-ONCE staged protocol: the
//     delta wall must stay in the r12 2.1 s class (the staging + rename
//     merge must not tax the daily-migration story).
//  3. streamShard skew: a 100k tree where ONE top-level subtree holds 90%
//     of files -- per-shard file counts and walk walls at shard depth 1
//     (the r12 behavior: one stream owns ~the whole tree) vs depth 2
//     (r13 streamShardDepth: ownership hashed one level down).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --jars target/scala-2.13/whisperpandasspark_2.13-0.1.0.jar \
//        --conf spark.sql.shuffle.partitions=32 -i tools/scale_check13.scala
import scala.collection.parallel.CollectionConverters._
import graft.format.WhisperWriter

spark.sparkContext.setLogLevel("ERROR")

// ---- the 1M tree (reused from scale_check12 when present) ----
val base = java.nio.file.Paths.get("/tmp/wsp_scale12_1m")
val mtIdle = java.nio.file.attribute.FileTime.from(java.time.Instant.ofEpochSecond(5000))
if (!java.nio.file.Files.isDirectory(base.resolve("d999"))) {
  val t0 = System.nanoTime()
  (0 until 1000).par.foreach { d =>
    val dir = base.resolve(f"d$d%03d")
    java.nio.file.Files.createDirectories(dir)
    (0 until 1000).foreach { i =>
      val p = dir.resolve(f"m$i%03d.wsp")
      WhisperWriter.writeFile(p, WhisperWriter.FileSpec(
        archives = Seq(WhisperWriter.ArchiveSpec(
          secondsPerPoint = 60, points = 100, filled = 100,
          lastTimestamp = 6000, rotation = (d + i) % 100))))
      java.nio.file.Files.setLastModifiedTime(p, mtIdle)
    }
  }
  println(f"MARKER_gen wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
}

// ---- 1. manifest: full write vs update ----
val manifest = "/tmp/wsp_scale13_manifest.jsonl.gz"
java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(manifest))
val tm0 = System.nanoTime()
val nFull = graft.sources.whisper.WhisperManifest.write(Seq(base.toString), manifest)
println(f"MARKER_manifest_full n=$nFull wall=${(System.nanoTime() - tm0) / 1e9}%.1f s")

// churn: 1000 changed-length rewrites (a second archive) + 500 new files
val tc0 = System.nanoTime()
(0 until 1000).par.foreach { i =>
  val p = base.resolve(f"d${i % 1000}%03d").resolve(f"m${i / 10}%03d.wsp")
  WhisperWriter.writeFile(p, WhisperWriter.FileSpec(
    archives = Seq(
      WhisperWriter.ArchiveSpec(60, 100, filled = 100, lastTimestamp = 6000, rotation = i % 100),
      WhisperWriter.ArchiveSpec(600, 50, filled = 10, lastTimestamp = 6000, rotation = 0))))
  java.nio.file.Files.setLastModifiedTime(p, mtIdle)
}
(0 until 500).par.foreach { i =>
  val p = base.resolve(f"d${i % 1000}%03d").resolve(f"new13_$i.wsp")
  WhisperWriter.writeFile(p, WhisperWriter.FileSpec(
    archives = Seq(WhisperWriter.ArchiveSpec(60, 100, filled = 50, lastTimestamp = 6000, rotation = 0))))
  java.nio.file.Files.setLastModifiedTime(p, mtIdle)
}
println(f"MARKER_churn wall=${(System.nanoTime() - tc0) / 1e9}%.1f s (1000 rewrites + 500 new)")

val tu0 = System.nanoTime()
val (nUpd, nReread) = graft.sources.whisper.WhisperManifest.update(Seq(base.toString), manifest)
println(f"MARKER_manifest_update n=$nUpd reread=$nReread wall=${(System.nanoTime() - tu0) / 1e9}%.1f s")

// manifest-backed plan over the refreshed manifest (spot check at default 8)
val tp0 = System.nanoTime()
val parts = spark.read.format("whisper")
  .option("headerManifest", manifest)
  .load(base.toString).rdd.getNumPartitions
println(f"MARKER_manifest_plan parts=$parts wall=${(System.nanoTime() - tp0) / 1e9}%.1f s")

// ---- 2. incremental export with the staged exactly-once protocol ----
// the r12 scenario verbatim (BENCH_NOTES r12 table: delta 2.1 s): full
// export of everything <= 6000, then 1000 files (one per dir) get a fresh
// ring ending at 12000 (fresh mtime), delta (6000, 12000] with slop=500 so
// idle files (mtime pinned at epoch 5000 < 6000-500) prune at plan time
val out = "/tmp/wsp_scale13_export"
org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
val tf0 = System.nanoTime()
val nBase = graft.Main.exportFull(spark, base.toString, out, Some(16), untilTs = 6000L)
println(f"MARKER_export_full n=$nBase wall=${(System.nanoTime() - tf0) / 1e9}%.1f s")
(0 until 1000).par.foreach { d =>
  WhisperWriter.writeFile(base.resolve(f"d$d%03d").resolve("m000.wsp"),
    WhisperWriter.FileSpec(archives = Seq(WhisperWriter.ArchiveSpec(
      secondsPerPoint = 60, points = 100, filled = 100,
      lastTimestamp = 12000, rotation = d % 100))))
}
val td0 = System.nanoTime()
val nDelta = graft.Main.exportDelta(spark, base.toString, out, Some(4), untilTs = 12000L,
  mtimeSlop = 500L)
println(f"MARKER_export_delta n=$nDelta wall=${(System.nanoTime() - td0) / 1e9}%.1f s (staged exactly-once)")
val dups = spark.read.parquet(out)
  .groupBy("file", "archive", "position", "timestamp").count()
  .filter(org.apache.spark.sql.functions.col("count") > 1).count()
println(s"MARKER_export_dups $dups (want 0)")

// ---- 3. skewed-tree sharding: depth 1 vs depth 2 ----
val skew = java.nio.file.Paths.get("/tmp/wsp_scale13_skew")
if (!java.nio.file.Files.isDirectory(skew.resolve("svcBig"))) {
  val t0 = System.nanoTime()
  val big = skew.resolve("svcBig")
  (0 until 900).par.foreach { h =>
    val d = big.resolve(f"host$h%03d"); java.nio.file.Files.createDirectories(d)
    (0 until 100).foreach { i =>
      WhisperWriter.writeFile(d.resolve(s"m$i.wsp"), WhisperWriter.FileSpec(
        archives = Seq(WhisperWriter.ArchiveSpec(60, 50, filled = 10, lastTimestamp = 6000, rotation = 0))))
    }
  }
  (0 until 100).par.foreach { s =>
    val d = skew.resolve(f"svc$s%03d"); java.nio.file.Files.createDirectories(d)
    (0 until 100).foreach { i =>
      WhisperWriter.writeFile(d.resolve(s"m$i.wsp"), WhisperWriter.FileSpec(
        archives = Seq(WhisperWriter.ArchiveSpec(60, 50, filled = 10, lastTimestamp = 6000, rotation = 0))))
    }
  }
  println(f"MARKER_skew_gen wall=${(System.nanoTime() - t0) / 1e9}%.1f s (100k files, 90%% in svcBig)")
}
for (depth <- Seq(1, 2)) {
  val sizes = (0 until 4).map { i =>
    val t0 = System.nanoTime()
    val n = graft.sources.whisper.WhisperIO.expandStatuses(
      Seq(skew.toString), parallelism = 64, shard = Some((i, 4)), shardDepth = depth).length
    (n, (System.nanoTime() - t0) / 1e9)
  }
  val tot = sizes.map(_._1).sum
  println(f"MARKER_skew_depth$depth sizes=${sizes.map(_._1).mkString(",")} " +
    f"walls=${sizes.map(s => f"${s._2}%.2f").mkString(",")} total=$tot max_share=${sizes.map(_._1).max * 100.0 / tot}%.1f%%")
}
println("MARKER done")
sys.exit(0)
