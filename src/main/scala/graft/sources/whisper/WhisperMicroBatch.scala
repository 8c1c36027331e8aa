package graft.sources.whisper

import scala.collection.parallel.CollectionConverters._

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/**
 * Streaming tail of Whisper files: `spark.readStream.format("whisper")`.
 *
 * Whisper points are keyed by wall-clock timestamp, so the stream offset IS a
 * timestamp watermark: each micro-batch delivers points with
 * `lastOffset < timestamp <= latestOffset`, where `latestOffset` advances to
 * the driver clock at each trigger (the same model as Graphite's own
 * write-behind: a slot for time T is final once T has passed). The time-range
 * predicate is pushed into the same partition reader the batch scan uses, so
 * a micro-batch reads only the ring-buffer slots in its window — not the file.
 *
 * The reference has no streaming surface at all (`whisper_pandas.ipynb:1382`
 * leaves write/update as a TODO); this is the Spark-native extension of its
 * data model into live pipelines.
 */
case class WhisperOffset(ts: Long) extends Offset {
  override def json(): String = ts.toString
}

class WhisperMicroBatchStream(
    rawPatterns: Seq[String],
    options: WhisperOptions,
    preds: Seq[WPred],
    requiredSchema: StructType,
    startTimestamp: Long
) extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = WhisperOffset(startTimestamp)

  private def nowTs: Long =
    if (options.streamNowOverride >= 0) options.streamNowOverride
    else System.currentTimeMillis() / 1000L

  /** Trigger.AvailableNow: freeze "now" at query start so the run drains
   * exactly the data available then, regardless of how long it takes. */
  @volatile private var frozenNow: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = frozenNow = Some(nowTs)

  override def latestOffset(): Offset = WhisperOffset(frozenNow.getOrElse(nowTs))

  /** SupportsAdmissionControl (via SupportsTriggerAvailableNow): no rate
   * limiting — each batch drains up to the frozen/current watermark. */
  override def latestOffset(start: Offset, limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset = WhisperOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = {}

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WhisperOffset].ts
    val hi = end.asInstanceOf[WhisperOffset].ts
    if (hi <= lo) return Array.empty
    // re-expand the user's glob/dir patterns at every trigger so .wsp files
    // that appear after stream start are tailed too (lenient: an empty match
    // is an empty micro-batch, not an error)
    val paths = WhisperIO.expandPatterns(rawPatterns, lenient = true)
    // same plan-time archive/file pruning AND small-unit bin-packing as the
    // batch scan -- a streaming tail over a large graphite tree pays the
    // per-unit scheduler tax EVERY trigger, so packing matters more here
    // probeOrdered=false: a micro-batch prunes by its pushed time window and
    // never consumes cross-chunk ordering, so skip the per-trigger rotation
    // probe (oversized timeSort archives stay one unit here)
    val units = WhisperPlanning.plan(paths, options, preds, probeOrdered = false)
      .map(_.asInstanceOf[WhisperInputPartition])
    WhisperPlanning.binPack(units, options).map {
      case m: WhisperMultiPartition => WhisperStreamMultiPartition(m.units, lo, hi): InputPartition
      case p: WhisperInputPartition => WhisperStreamPartition(p, lo, hi): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WhisperStreamReaderFactory(options, preds, requiredSchema)

  override def stop(): Unit = {}
}

/** A batch partition plus its micro-batch window (exclusive lo, inclusive hi). */
final case class WhisperStreamPartition(base: WhisperInputPartition, lo: Long, hi: Long)
  extends InputPartition

/** A bin of small units plus the shared micro-batch window. */
final case class WhisperStreamMultiPartition(units: Array[WhisperInputPartition], lo: Long, hi: Long)
  extends InputPartition

/** Appends the partition's time window to the pushed predicates and reuses
 * the batch partition reader — the window prunes during decode. */
class WhisperStreamReaderFactory(
    options: WhisperOptions,
    preds: Seq[WPred],
    requiredSchema: StructType
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition) = partition match {
    case p: WhisperStreamPartition =>
      val windowPreds = Seq(NumCmp("timestamp", ">", p.lo), NumCmp("timestamp", "<=", p.hi))
      new WhisperPartitionReader(p.base, options, preds ++ windowPreds, requiredSchema)
    case m: WhisperStreamMultiPartition =>
      val windowPreds = Seq(NumCmp("timestamp", ">", m.lo), NumCmp("timestamp", "<=", m.hi))
      new WhisperSequentialReader[org.apache.spark.sql.catalyst.InternalRow](
        m.units, u => new WhisperPartitionReader(u, options, preds ++ windowPreds, requiredSchema))
  }
}
