package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `winnow(text)` — document fingerprints by winnowing (Schleimer, Wilkerson,
 * Aiken: "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
 * 2003 — the MOSS algorithm): Rabin-Karp rolling hashes over all k-byte
 * grams, then the minimum hash of each w-hash window, deduplicated. Two
 * documents sharing any run of >= w+k-1 bytes share a fingerprint, which no
 * whole-document hash (md5/SimHash) guarantees.
 *
 * Output: sorted distinct array<long> of selected hashes — join/explode it
 * to find local overlaps (plagiarism-style matches, boilerplate detection).
 * Fixed parameters k=8, w=16 (guarantee threshold 23 bytes), chosen so a
 * ~500-char document yields ~30-60 fingerprints.
 *
 * Custom expression because built-ins cannot maintain a rolling hash state
 * across a string; codegen keeps it in the scan's tight loop.
 */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  import RollingFingerprint._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow needs STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(winnow(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.RollingFingerprint.winnow($c.getBytes()));")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint = copy(child = newChild)
}

object RollingFingerprint {
  final val K = 8 // gram size (bytes)
  final val W = 16 // winnowing window (hashes)
  private final val B = 1000000007L // rolling base
  // B^(K-1) mod 2^64, for removing the outgoing byte
  private final val BPow: Long = {
    var p = 1L
    var i = 1
    while (i < K) { p *= B; i += 1 }
    p
  }

  /** Winnowing fingerprint of a byte string (deterministic; empty-safe). */
  def winnow(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length
    if (n < K) return Array.empty[Long]
    val nHashes = n - K + 1
    val hashes = new Array[Long](nHashes)
    var h = 0L
    var i = 0
    while (i < K) { h = h * B + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = K
    while (i < n) {
      h = (h - (bytes(i - K) & 0xff) * BPow) * B + (bytes(i) & 0xff)
      hashes(i - K + 1) = h
      i += 1
    }
    // winnowing: rightmost minimum of each window of W hashes
    val selected = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    val lastStart = math.max(nHashes - W, 0)
    while (start <= lastStart) {
      var minIdx = start
      var j = start + 1
      val end = math.min(start + W, nHashes)
      while (j < end) {
        if (java.lang.Long.compareUnsigned(hashes(j), hashes(minIdx)) <= 0) minIdx = j
        j += 1
      }
      selected.add(hashes(minIdx))
      start += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

/**
 * `winnow_md5(string)` — [[RollingFingerprint]] on the engine-portable md5
 * substrate (the q96/q97 pairing discipline): each k-gram's hash is the
 * first 4 BYTES of md5(gram) big-endian (= the first 8 hex digits, exactly
 * what DuckDB parses in q97's oracle), and MOSS rightmost-minimum selection
 * runs through the same `t = h·2^31 + (2^31−1−p)` encoding the declarative
 * SQL uses — minimizing t minimizes h with largest-position tie-break, and
 * `t div 2^31` recovers h. Field widths: h is 32-bit (first 8 md5 hex
 * digits), the position field is 31-bit, so t ≤ 2^63−1 — exactly the signed
 * 64-bit range both engines share, with no underflow until a document
 * exceeds 2^31−1 grams (~2 GiB of text, far beyond any row-sized document;
 * the previous 16-bit field corrupted ordering past 65,535 grams ≈ 65 KB).
 *
 * This is the kernel that lets [[graft.operators.DedupOps.winnowPortable]]
 * skip materializing the gram relation entirely: one map-side pass per row
 * instead of an n-row explode + doc-keyed window shuffle over every gram
 * position (measured 4.5 s → sub-second at sf0.1). Unlike the rolling-hash
 * kernel, a document with fewer than W complete windows yields NO
 * fingerprints — mirroring the SQL's `p <= pmax − (W−1)` frame exactly.
 */
case class Md5Winnow(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_md5"

  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_md5 needs STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(Md5Winnow.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.Md5Winnow.compute($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): Md5Winnow = copy(child = newChild)
}

/**
 * `gram_hash20(string)` — the DISTINCT character-20-gram set of a document
 * as 60-bit engine-portable hashes (the top 15 hex digits of md5(gram),
 * exactly what DuckDB computes from `md5(substr(text, i, 20))`), sorted
 * ascending. This is the shuffle-key compression kernel for the ExactSubstr
 * duplication profile ([[graft.operators.DedupOps.substringDup]]): the gram
 * incidence count shuffles 8-byte longs instead of 20-char strings (~60%
 * less wire payload per key), and the gram relation never materializes —
 * substring extraction, hashing, and per-document DISTINCTing all happen in
 * one tight loop per row inside whole-stage codegen. 60 bits keep the
 * expected collision count negligible at corpus scale (n²/2^61 — well under
 * one false duplicate pair per 10^9 distinct grams), and both engines hash
 * identically so even a collision would agree across the oracle boundary.
 *
 * Why not SQL-level `conv(substr(md5(g),1,15),16,10)`: measured SLOWER than
 * the raw-string shuffle at sf0.1 — per-gram expression evaluation routes
 * every gram through UTF8String/hex-string intermediates. The in-kernel
 * ThreadLocal MessageDigest loop is the same discipline that took the
 * winnowing query from 4.5 s to ~1 s ([[Md5Winnow]]).
 */
case class Md5GramHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hash20"

  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_hash20 needs STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(Md5GramHash.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.functions.Md5GramHash.compute($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): Md5GramHash = copy(child = newChild)
}

object Md5GramHash {
  final val K = 20 // ExactSubstr gram width (characters, matching substr semantics)

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Sorted distinct 60-bit gram hashes; empty when the document is shorter
   * than K characters. The hash is the top 15 md5 nibbles big-endian:
   * bytes 0..6 then the high nibble of byte 7 — digit-for-digit what the
   * oracle's hex parse of `substr(md5(g), 1, 15)` yields. */
  def compute(s: String): Array[Long] = {
    val n = s.length
    if (n < K) return Array.empty[Long]
    val md = mdPool.get()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= n - K) {
      md.reset()
      val d = md.digest(s.substring(i, i + K).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
      set.add(java.lang.Long.valueOf(h))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

object Md5Winnow {
  final val K = 8 // gram size (characters — positions match substr semantics)
  final val W = 16 // winnowing window (hashes)

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct winnowed fingerprints (ascending), or empty when the document
   * has no complete window of W gram hashes. */
  def compute(s: String): Array[Long] = {
    val n = s.length
    if (n < K) return Array.empty[Long]
    val nh = n - K + 1
    if (nh < W) return Array.empty[Long]
    val md = mdPool.get()
    val ts = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      md.reset()
      val d = md.digest(s.substring(i, i + K).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) | ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      ts(i) = h * 2147483648L + (2147483647L - (i + 1)) // p is 1-based, 31-bit field
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start <= nh - W) {
      var m = ts(start)
      var j = start + 1
      while (j < start + W) {
        if (ts(j) < m) m = ts(j)
        j += 1
      }
      sel.add(java.lang.Long.valueOf(m / 2147483648L))
      start += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}
