package graft.sources.whisper

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{Path => HPath}

import graft.format.WhisperCodec
import graft.format.WhisperCodec.{ArchiveMeta, FileMeta}

/**
 * Header manifest: one JSONL(.gz) file mapping whisper path -> (file length,
 * parsed header), written once and consumed at plan time in place of one
 * ranged header read PER FILE.
 *
 * Why it exists: whisper headers are CREATE-TIME CONSTANTS of the fixed-size
 * preallocated format (point writes mutate slots in place and never touch the
 * header), so re-reading them is pure waste — and on an object store each
 * header read is a ~10-50 ms GET, which makes repeated planning over a
 * million-file tree a multi-minute request sweep even fully parallel
 * (measured: tools `LatencyProbe`, BENCH_NOTES r12). The streaming tail
 * already caches headers per stream ([[WhisperMicroBatchStream]]); the
 * manifest is the same idea made durable and shareable across batch queries,
 * sessions, and jobs.
 *
 * Staleness: every entry carries the file's length at manifest time. Length
 * is create-time-constant too, and changes exactly when a file is rewritten
 * with a different retention layout — so the consumer compares the entry's
 * length against the directory walk's (free) and falls back to a fresh
 * header read on mismatch or absence. A stale manifest can therefore cost
 * extra header reads, never wrong plans.
 *
 * Format: one JSON object per line —
 * `{"path":...,"len":N,"agg":N,"maxRet":N,"xff":F,"archives":[[off,spp,pts],...]}`
 * — gzip-compressed when the output path ends in `.gz`. JSONL keeps the
 * loader a plain driver-side stream (no Spark job inside scan planning) and
 * appends/merges trivially; ~120 B/file means a million-file manifest is
 * ~15 MB gzipped and loads in seconds.
 */
object WhisperManifest {

  final case class Entry(len: Long, meta: FileMeta)

  /** Walk `patterns`, read every header concurrently, write the manifest.
   * Returns the number of files recorded. */
  def write(patterns: Seq[String], out: String, parallelism: Int = 64): Long = {
    val entries = WhisperIO.expandStatuses(patterns, parallelism = parallelism)
    val metas = WhisperIO.parMap(entries, parallelism) { e =>
      val gz = e.path.endsWith(".gz")
      (e, WhisperIO.readMetaHeaderOnly(e.path, gz, e.len))
    }
    val p = new HPath(out)
    val fs = p.getFileSystem(WhisperIO.hadoopConf())
    val raw = fs.create(p, true)
    val w = new OutputStreamWriter(
      if (out.endsWith(".gz")) new GZIPOutputStream(raw, 1 << 16) else raw,
      StandardCharsets.UTF_8)
    val om = new ObjectMapper()
    try {
      metas.foreach { case (e, m) =>
        val sb = new StringBuilder(160)
        sb.append("{\"path\":").append(om.writeValueAsString(e.path))
          .append(",\"len\":").append(e.len)
          .append(",\"agg\":").append(m.aggregationType)
          .append(",\"maxRet\":").append(m.maxRetention)
          .append(",\"xff\":").append(m.xFilesFactor)
          .append(",\"archives\":[")
        var i = 0
        while (i < m.archives.length) {
          val a = m.archives(i)
          if (i > 0) sb.append(',')
          sb.append('[').append(a.offset).append(',')
            .append(a.secondsPerPoint).append(',').append(a.points).append(']')
          i += 1
        }
        sb.append("]}\n")
        w.write(sb.toString)
      }
    } finally w.close()
    metas.length.toLong
  }

  /** Parse one manifest into path -> Entry. */
  def loadRaw(path: String): Map[String, Entry] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(WhisperIO.hadoopConf())
    val raw = fs.open(p)
    val r = new BufferedReader(new InputStreamReader(
      if (path.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw,
      StandardCharsets.UTF_8))
    val om = new ObjectMapper()
    val out = Map.newBuilder[String, Entry]
    try {
      var line = r.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          val n = om.readTree(line)
          val fp = n.get("path").asText()
          val len = n.get("len").asLong()
          val archives = {
            val arr = n.get("archives")
            (0 until arr.size()).map { i =>
              val a = arr.get(i)
              ArchiveMeta(i, a.get(0).asLong(), a.get(1).asLong(), a.get(2).asLong())
            }
          }
          out += fp -> Entry(len, FileMeta(
            fp, n.get("agg").asInt(), n.get("maxRet").asLong(),
            n.get("xff").floatValue(), archives,
            // gzip files record the on-disk size here; the header-only
            // planning path never consults fileSizeActual either way
            len))
        }
        line = r.readLine()
      }
    } finally r.close()
    out.result()
  }

  /** [[loadRaw]] memoized PER PATH with the manifest's (length, mtime) as
   * the version stamp: planning may run many times per session over the
   * same manifest, and a million-entry parse should be paid once, not per
   * query. A rewritten manifest (new length/mtime) REPLACES the entry —
   * keying the map by (path, len, mtime) instead would strand every
   * superseded version's fully-parsed Map in the cache forever, a
   * hundreds-of-MB leak per daily refresh on a long-lived driver.
   *
   * get + put, NOT computeIfAbsent: the miss path is manifest I/O, and a
   * ConcurrentHashMap mapping function that blocks trips the JDK's
   * "Recursive update" guard when another key lands in the same bin while
   * the reservation is held (observed twice this round — here and in the
   * micro-batch header cache) besides serializing same-bin loads. A raced
   * duplicate parse is idempotent (last writer wins; both parsed the same
   * version or a newer one, either of which is valid to serve). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), Map[String, Entry])]()

  def load(path: String): Map[String, Entry] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(WhisperIO.hadoopConf())
    val st = fs.getFileStatus(p)
    val version = (st.getLen, st.getModificationTime)
    val hit = cache.get(path)
    if (hit != null && hit._1 == version) hit._2
    else {
      val m = loadRaw(path)
      cache.put(path, (version, m))
      m
    }
  }
}
