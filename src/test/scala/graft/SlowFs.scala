package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, FileStatus, Path, RawLocalFileSystem}

/**
 * TEST-ONLY latency-injecting filesystem (`slowfs://` scheme): delegates to
 * the local FS but sleeps [[SlowFs.latencyMs]] before every metadata/open
 * operation and counts them — the object-store GET model (10-50 ms per
 * open/list/stat) the r12 planning-envelope work is measured against
 * (VERDICT r11 #1). Registered per session via
 * `spark.hadoop.fs.slowfs.impl = graft.SlowFs`; paths are `slowfs:/abs/path`.
 *
 * The counters are the deterministic assertion surface: wall-clock proves
 * latency HIDING, the counters prove request-count REDUCTION (manifest hits,
 * skipped getFileStatus, shard-pruned listings) independent of box speed.
 */
object SlowFs {
  @volatile var latencyMs: Long = 0L
  val opens = new AtomicLong(0L)
  val stats = new AtomicLong(0L)
  val lists = new AtomicLong(0L)

  def reset(latency: Long): Unit = {
    latencyMs = latency
    opens.set(0L); stats.set(0L); lists.set(0L)
  }
}

class SlowFs extends RawLocalFileSystem {
  private def nap(): Unit = {
    val ms = SlowFs.latencyMs
    if (ms > 0) Thread.sleep(ms)
  }

  override def getUri: URI = URI.create("slowfs:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    SlowFs.opens.incrementAndGet(); nap()
    super.open(f, bufferSize)
  }

  override def getFileStatus(f: Path): FileStatus = {
    SlowFs.stats.incrementAndGet(); nap()
    super.getFileStatus(f)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    SlowFs.lists.incrementAndGet(); nap()
    super.listStatus(f)
  }
}
