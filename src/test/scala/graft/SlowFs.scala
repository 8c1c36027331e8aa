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
  /** Entries returned per LIST round trip. Real object stores page their
   * listings (S3 ListObjectsV2: 1000 keys/response, serial continuation
   * tokens), so one listStatus of an n-entry directory costs ceil(n/page)
   * SEQUENTIAL round trips, not one — the correction VERDICT r12 #1 asked
   * for before trusting the walk cost model's extrapolations. 1000 matches
   * S3/GCS/Azure defaults; shrink it in tests to surface pagination without
   * million-entry fixtures. */
  @volatile var listPageSize: Int = 1000
  val opens = new AtomicLong(0L)
  val stats = new AtomicLong(0L)
  val lists = new AtomicLong(0L)
  /** LIST round trips including continuation pages (>= lists). */
  val listPages = new AtomicLong(0L)

  def reset(latency: Long, pageSize: Int = 1000): Unit = {
    latencyMs = latency
    listPageSize = pageSize
    opens.set(0L); stats.set(0L); lists.set(0L); listPages.set(0L)
  }
}

/**
 * TEST-ONLY conditional-create filesystem (`condfs://` scheme): fakes the
 * S3A conditional-write surface (HADOOP-19256) over the local FS —
 * announces [[graft.Main.ConditionalCreateCapability]], and a
 * `create(overwrite = false)` of an EXISTING path does NOT fail up front
 * (object stores have no create-time existence check); instead the commit
 * fails at `close()` with the 412-precondition shape, leaving the existing
 * object untouched — exactly the contention behavior the export lock's
 * capability-probed path must map to "lock held" without deleting the
 * winner's lock.
 */
class CondCreateFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("condfs:///")

  override def hasPathCapability(p: Path, capability: String): Boolean =
    capability == "fs.option.create.conditional.overwrite" ||
      super.hasPathCapability(p, capability)

  override def create(
      f: Path,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite && exists(f))
      new org.apache.hadoop.fs.FSDataOutputStream(new java.io.OutputStream {
        override def write(b: Int): Unit = ()
        override def close(): Unit =
          throw new java.io.IOException(s"412 PreconditionFailed: If-None-Match PUT lost the race for $f")
      }, null)
    else super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}

class SlowFs extends RawLocalFileSystem {
  private def nap(): Unit = {
    val ms = SlowFs.latencyMs
    if (ms > 0) Thread.sleep(ms)
  }

  /** RawLocalFileSystem DELEGATES internally — listStatus calls
   * getFileStatus once per child, open stats its target — and billing
   * those inner calls misprices the model badly: a real LIST response
   * carries each entry's metadata (one round trip per page, not one HEAD
   * per child), and a real GET is one request, not GET+HEAD. The r12
   * probe numbers overbilled exactly this way (a 100-entry directory cost
   * 100 naps instead of 1), which understated the manifest's advantage —
   * caught re-measuring for VERDICT r12 #1. Inner delegated calls are
   * suppressed per-thread so one public operation bills exactly one
   * modeled request (or one per page). */
  private val inOp = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }
  private def delegated[A](body: => A): A = {
    val prev = inOp.get()
    inOp.set(java.lang.Boolean.TRUE)
    // restore, don't clear: delegation NESTS (listStatus -> getFileStatus
    // -> its own delegated block), and clearing here re-exposed every
    // sibling child after the first to billing
    try body finally inOp.set(prev)
  }

  override def getUri: URI = URI.create("slowfs:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (!inOp.get()) { SlowFs.opens.incrementAndGet(); nap() }
    delegated(super.open(f, bufferSize))
  }

  override def getFileStatus(f: Path): FileStatus = {
    if (!inOp.get()) { SlowFs.stats.incrementAndGet(); nap() }
    delegated(super.getFileStatus(f))
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val outer = !inOp.get()
    if (outer) SlowFs.lists.incrementAndGet()
    val res = delegated(super.listStatus(f))
    if (outer) {
      // bill ceil(n/page) SERIAL naps: continuation tokens chain, so a
      // large directory's listing cannot be latency-hidden within itself
      // (only across sibling directories — which is what the level-
      // synchronous walk's pool does)
      val pages = math.max(1L, (res.length + SlowFs.listPageSize - 1L) / SlowFs.listPageSize)
      SlowFs.listPages.addAndGet(pages)
      var i = 0L
      while (i < pages) { nap(); i += 1 }
    }
    res
  }

  /** Lazily-paged iterator, the way real object stores serve it (S3A's
   * listing iterators fetch one continuation page at a time): pages are
   * billed AS CONSUMED, so a caller that stops after n entries pays
   * ceil(n/page) round trips, not the whole directory — the request shape
   * the bounded manifestListing reconcile depends on. The default
   * FileSystem implementation would call listStatus (billing everything
   * up front), which models a store that has no lazy paging — wrong for
   * every store this repo targets.
   *
   * LAZY IN WORK, not just in billing (r15, the r16 seed closed
   * same-round): the previous form materialized the FULL local listing up
   * front (RawLocalFileSystem.listStatus = one local stat PER CHILD — ~10 s
   * of real CPU at a 1M-entry dir), so a consumer of ONE bounded page
   * still paid the whole directory in probe wall time, a shim artifact the
   * r15 stream rows needed decomposition rows to see around. Now: one
   * readdir for the NAME array (cheap), sorted lexicographically (the
   * order object stores return and the reconcile's deletion range
   * expects), and each entry's metadata is stat'ed only WHEN CONSUMED —
   * a bounded consumer pays ceil(consumed/page) naps + O(consumed) local
   * work. */
  override def listStatusIterator(f: Path): org.apache.hadoop.fs.RemoteIterator[FileStatus] = {
    val outer = !inOp.get()
    val dir = pathToFile(f)
    val names = delegated {
      if (!dir.exists()) throw new java.io.FileNotFoundException(f.toString)
      val raw = dir.list()
      if (raw == null) null // a plain file: fall through to the status-of-self shape
      else { java.util.Arrays.sort(raw.asInstanceOf[Array[AnyRef]]); raw }
    }
    if (names == null) return {
      // match FileSystem semantics for a non-directory path: one-element
      // iterator over the file's own status (billed as a stat-shaped LIST)
      val self = delegated(super.getFileStatus(f))
      if (outer) { SlowFs.lists.incrementAndGet(); SlowFs.listPages.incrementAndGet(); nap() }
      new org.apache.hadoop.fs.RemoteIterator[FileStatus] {
        private var done = false
        override def hasNext: Boolean = !done
        override def next(): FileStatus = {
          if (done) throw new java.util.NoSuchElementException(f.toString)
          done = true; self
        }
      }
    }
    if (outer) SlowFs.lists.incrementAndGet()
    // unbilled child stat: `delegated` raises the in-op flag, so the public
    // override passes straight through to the local FS (the metadata is
    // part of the LIST page's payload in the modeled store)
    val statChild: String => FileStatus = name => delegated(getFileStatus(new Path(f, name)))
    new org.apache.hadoop.fs.RemoteIterator[FileStatus] {
      private var i = 0
      private def pageEdge(): Unit =
        if (outer && i % SlowFs.listPageSize == 0 && i < names.length) {
          SlowFs.listPages.incrementAndGet(); nap()
        }
      // an empty directory still costs one LIST round trip
      if (outer && names.isEmpty) { SlowFs.listPages.incrementAndGet(); nap() }
      override def hasNext: Boolean = i < names.length
      override def next(): FileStatus = {
        if (!hasNext) throw new java.util.NoSuchElementException(f.toString)
        pageEdge()
        val st = statChild(names(i))
        i += 1
        st
      }
    }
  }
}
