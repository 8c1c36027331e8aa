package graft.sources.whisper

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.format.{WhisperCodec, WhisperWriter}
import graft.format.WhisperWriter.{ArchiveSpec, FileSpec}

/** Property tests for the header manifest (r13): the JSONL round trip must
 * preserve EVERY field planning consumes over arbitrary layouts (a lossy
 * float or truncated long here would silently mis-prune archives at plan
 * time), and [[WhisperManifest.sameHeader]] — the same-length re-layout
 * detector — must flag a perturbation of ANY single consumed field while
 * accepting true copies. Lives in the whisper package for access to the
 * package-private surface; pure JVM + local temp files, no Spark session. */
object WhisperManifestProps extends Properties("WhisperManifest") {

  private val genArchive: Gen[ArchiveSpec] = for {
    spp <- Gen.oneOf(1L, 10L, 60L, 3600L, 86400L)
    points <- Gen.chooseNum(1L, 500L)
    filled <- Gen.chooseNum(0L, points)
    rotation <- Gen.chooseNum(0L, points - 1)
    lastTs <- Gen.chooseNum(10000000L, 2000000000L)
  } yield ArchiveSpec(spp, points, filled, lastTs - lastTs % spp, rotation)

  private val genFile: Gen[FileSpec] = for {
    method <- Gen.oneOf(WhisperCodec.AggregationMethods.values.toSeq)
    xff <- Gen.chooseNum(0.0f, 1.0f)
    archives <- Gen.nonEmptyListOf(genArchive).map(_.take(4))
  } yield FileSpec(method, xff, archives)

  private def metaOf(spec: FileSpec): (WhisperCodec.FileMeta, Long) = {
    val bos = new ByteArrayOutputStream()
    WhisperWriter.write(bos, spec)
    val bytes = bos.toByteArray
    (WhisperCodec.parseMeta(bytes, "mem", bytes.length.toLong), bytes.length.toLong)
  }

  property("JSONL round trip preserves every planning field (incl. exact xff)") =
    forAll(Gen.listOfN(3, genFile)) { specs =>
      val dir = Files.createTempDirectory("manifest-props")
      specs.zipWithIndex.foreach { case (s, i) =>
        WhisperWriter.writeFile(dir.resolve(s"m$i.wsp"), s)
      }
      val out = dir.resolve("m.jsonl.gz").toString
      WhisperManifest.write(Seq(dir.toString + "/*.wsp"), out)
      val loaded = WhisperManifest.loadRaw(out)
      Prop.all(specs.zipWithIndex.map { case (s, i) =>
        // manifest keys carry the walk's scheme qualification (file:/...)
        val entry = loaded.collectFirst {
          case (p, e) if p.endsWith(s"/m$i.wsp") => e
        }.getOrElse(sys.error(s"m$i.wsp missing from manifest: ${loaded.keys}"))
        val (want, _) = metaOf(s)
        (entry.len == Files.size(dir.resolve(s"m$i.wsp"))) :| s"len m$i" &&
          (entry.meta.aggregationType == want.aggregationType) :| s"agg m$i" &&
          (entry.meta.maxRetention == want.maxRetention) :| s"maxRet m$i" &&
          (entry.meta.xFilesFactor == want.xFilesFactor) :| s"xff m$i (float round trip)" &&
          (entry.meta.archives.map(a => (a.offset, a.secondsPerPoint, a.points)) ==
            want.archives.map(a => (a.offset, a.secondsPerPoint, a.points))) :| s"archives m$i"
      }: _*)
    }

  property("parallel parse (> 64k lines) is line-for-line identical to the serial path (r14)") =
    Prop.secure {
      // build a small REAL manifest, then synthesize a 70,001-line one by
      // replicating its lines under distinct paths — pushes loadRaw onto
      // the chunked parallel-parse branch (threshold 65,536) while every
      // line's expected Entry is known from the serial-parsed original
      val dir = Files.createTempDirectory("manifest-par")
      val specs = Seq(
        FileSpec(archives = Seq(ArchiveSpec(10, 120, 60, 1600000000L, 7))),
        FileSpec(archives = Seq(ArchiveSpec(60, 50, 50, 1600000000L, 3),
          ArchiveSpec(600, 25, 10, 1600000000L, 0))))
      specs.zipWithIndex.foreach { case (s, i) =>
        WhisperWriter.writeFile(dir.resolve(s"m$i.wsp"), s)
      }
      val small = dir.resolve("small.jsonl.gz").toString
      WhisperManifest.write(Seq(dir.toString + "/*.wsp"), small)
      val base = WhisperManifest.loadRaw(small).toSeq.sortBy(_._1)
      // re-serialize each base entry as raw JSON lines with swapped paths
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = 70001
      val big = dir.resolve("big.jsonl.gz")
      val w = new java.io.OutputStreamWriter(
        new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(big)),
        java.nio.charset.StandardCharsets.UTF_8)
      try {
        (0 until n).foreach { i =>
          val (_, e) = base(i % base.length)
          val archives = e.meta.archives
            .map(a => s"[${a.offset},${a.secondsPerPoint},${a.points}]").mkString(",")
          w.write(s"""{"path":${om.writeValueAsString(s"/syn/f$i.wsp")},"len":${e.len},""" +
            s""""agg":${e.meta.aggregationType},"maxRet":${e.meta.maxRetention},""" +
            s""""xff":${e.meta.xFilesFactor},"archives":[$archives]}""" + "\n")
        }
      } finally w.close()
      val loaded = WhisperManifest.loadRaw(big.toString)
      (loaded.size == n) :| s"size ${loaded.size} != $n" &&
        Prop.all(Seq(0, 1, 16384, 65535, 65536, n - 1).map { i =>
          val got = loaded(s"/syn/f$i.wsp")
          val (_, want) = base(i % base.length)
          (got.len == want.len && got.meta.aggregationType == want.meta.aggregationType &&
            got.meta.maxRetention == want.meta.maxRetention &&
            got.meta.xFilesFactor == want.meta.xFilesFactor &&
            got.meta.archives.map(a => (a.offset, a.secondsPerPoint, a.points)) ==
              want.meta.archives.map(a => (a.offset, a.secondsPerPoint, a.points))) :| s"entry $i"
        }: _*)
    }

  property("sampleForCheck GUARANTEES min(k, n) entries for any seed (ADVICE r13)") =
    forAll(
      Gen.chooseNum(0, 200),
      Gen.chooseNum(1, 16),
      Gen.chooseNum(Int.MinValue, Int.MaxValue)) { (n, k, seed) =>
      val served = (0 until n).map(i => WhisperIO.FileEntry(s"/tree/svc${i % 7}/m$i.wsp", 0L, 100L))
      val sample = WhisperManifest.sampleForCheck(served, k, seed)
      val want = math.min(k, n)
      // the old murmur-stride filter could yield ZERO checks when the hash
      // distribution missed the stride — the plan then trusted the manifest
      // with no verification at all
      (sample.size == want) :| s"size ${sample.size} != min($k, $n)" &&
        (sample.map(_.path).distinct.size == sample.size) :| "duplicate entries sampled" &&
        (sample == WhisperManifest.sampleForCheck(served, k, seed)) :| "not deterministic per seed"
    }

  property("sampleForCheck rotates coverage across seeds (the per-version sweep)") =
    forAll(Gen.chooseNum(32, 128)) { n =>
      val served = (0 until n).map(i => WhisperIO.FileEntry(s"/tree/m$i.wsp", 0L, 100L))
      val union = (0 until 8).flatMap(seed =>
        WhisperManifest.sampleForCheck(served, 4, seed).map(_.path)).toSet
      // 8 rotated 4-samples must cover strictly more than any single sample
      (union.size > 4) :| s"rotation is vacuous: 8 seeds covered only ${union.size} paths"
    }

  property("sharded write/update tile exactly; update re-reads O(changed) (r15)") =
    forAll(Gen.chooseNum(2, 5), Gen.listOfN(7, genFile)) { (n, specs) =>
      val dir = Files.createTempDirectory("manifest-shards-prop")
      specs.zipWithIndex.foreach { case (s, i) =>
        WhisperWriter.writeFile(dir.resolve(s"m$i.wsp"), s)
      }
      val pat = dir.toString + "/*.wsp"
      val base = dir.resolve("m.jsonl.gz").toString
      WhisperManifest.write(Seq(pat), base) // unsharded ground truth
      WhisperManifest.write(Seq(pat), base, shards = n)
      val whole = WhisperManifest.loadRaw(base)
      val shards = (0 until n).map(i =>
        WhisperManifest.loadRaw(WhisperManifest.shardPath(base, i, n)))
      val union = shards.reduce(_ ++ _)
      val tiling =
        (shards.map(_.size).sum == whole.size) :| "shard sizes sum to the whole" &&
          (union == whole) :| "union of shards == unsharded manifest" &&
          Prop.all(whole.keys.toSeq.map(p =>
            shards(WhisperManifest.shardOf(p, n)).contains(p) :| s"entry not in its hash-owner: $p"): _*)
      // churn: one file appears, one disappears; a sharded --update must
      // keep the tiling AND re-read only the changed file's header
      WhisperWriter.writeFile(dir.resolve("zz_new.wsp"), specs.head)
      Files.delete(dir.resolve("m0.wsp"))
      val (total, reread) = WhisperManifest.update(Seq(pat), base, shards = n)
      val after = (0 until n).map(i =>
        WhisperManifest.loadRaw(WhisperManifest.shardPath(base, i, n)))
      val afterUnion = after.reduce(_ ++ _)
      // layout transitions (r15 review fix): sharded writes maintain the
      // BASE file too, so an unsharded consumer stays fresh and a plain
      // --update after --shards=n works — and both directions agree
      val baseAfter = WhisperManifest.loadRaw(base)
      // second churn, then a PLAIN --update (shards=1): the existing shard
      // layout must be detected and refreshed too (ADVICE r15 — it used to
      // stay silently stale for sharded consumers)
      WhisperWriter.writeFile(dir.resolve("zz_new2.wsp"), specs.head)
      val (totalPlain, rereadPlain0) = WhisperManifest.update(Seq(pat), base) // plain update
      val rereadPlain = rereadPlain0 - 1L // zz_new2 is a genuine new-header read
      val plainShards = (0 until n).map(i =>
        WhisperManifest.loadRaw(WhisperManifest.shardPath(base, i, n)))
      val plainUnion = plainShards.reduce(_ ++ _)
      val shardRefresh =
        plainUnion.keys.exists(_.endsWith("/zz_new2.wsp")) :|
          "plain --update left existing shard files stale (zz_new2 missing)" &&
          (plainUnion == WhisperManifest.loadRaw(base)) :|
          "plain --update: shard union != refreshed base"
      tiling && shardRefresh &&
        (total == specs.length.toLong) :| s"post-churn count $total" &&
        (reread == 1L) :| s"update re-read $reread headers, want 1 (O(changed))" &&
        afterUnion.keys.exists(_.endsWith("/zz_new.wsp")) :| "added file missing" &&
        (!afterUnion.keys.exists(_.endsWith("/m0.wsp"))) :| "deleted file retained" &&
        Prop.all(afterUnion.keys.toSeq.map(p =>
          after(WhisperManifest.shardOf(p, n)).contains(p) :| s"post-update owner: $p"): _*) &&
        (baseAfter == afterUnion) :| "sharded update left the base file stale" &&
        (totalPlain == total + 1 && rereadPlain == 0L) :| s"plain update after --shards broke: $totalPlain/$rereadPlain"
    }

  property("sameHeader accepts a true copy and flags ANY single-field perturbation") =
    forAll(genFile) { spec =>
      val (m, _) = metaOf(spec)
      val copy = m.copy()
      val a0 = m.archives.head
      val perturbed: Seq[(String, WhisperCodec.FileMeta)] = Seq(
        "agg" -> m.copy(aggregationType = m.aggregationType + 1),
        "maxRet" -> m.copy(maxRetention = m.maxRetention + 1),
        "xff" -> m.copy(xFilesFactor =
          if (m.xFilesFactor < 0.5f) m.xFilesFactor + 0.25f else m.xFilesFactor - 0.25f),
        "spp" -> m.copy(archives =
          a0.copy(secondsPerPoint = a0.secondsPerPoint + 1) +: m.archives.tail),
        "points" -> m.copy(archives = a0.copy(points = a0.points + 1) +: m.archives.tail),
        "offset" -> m.copy(archives = a0.copy(offset = a0.offset + 12) +: m.archives.tail),
        "archCount" -> m.copy(archives = m.archives :+ a0)
      )
      WhisperManifest.sameHeader(m, copy) :| "true copy accepted" &&
        Prop.all(perturbed.map { case (what, p) =>
          (!WhisperManifest.sameHeader(m, p)) :| s"$what perturbation missed"
        }: _*)
    }
}
