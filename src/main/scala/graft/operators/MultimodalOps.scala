package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ByteHistogram

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract stages.
 *
 * The actual media decode is STUBBED (this container has no image/audio
 * codecs): [[FakeDecoder.decode]] is a deterministic fake that parses payload
 * bytes as if they were a media header. Everything around it — asset schema,
 * batched per-partition execution, typed Dataset stages, partition sizing —
 * is the real Spark plumbing a production decode would use; swapping the stub
 * for a JNI/ffmpeg call changes one function.
 */
object MultimodalOps {
  import Tables.t

  /** Asset row: payload + typed metadata, the schema contract for all
   * multimodal stages. At 100 TB payloads stay in their own column so column
   * pruning lets metadata-only queries skip them entirely. */
  final case class Asset(id: Long, modality: String, bytes: Array[Byte], source: String)

  final case class Decoded(
      id: Long,
      modality: String,
      width: Int,
      height: Int,
      n_frames: Int,
      byte_len: Long
  )

  /** STUB decoder — deterministic fake: derives "dimensions" from the first
   * payload bytes. Replace with a real codec for production use. */
  object FakeDecoder {
    def decode(a: Asset): Decoded = {
      val b0 = if (a.bytes.length > 0) a.bytes(0) & 0xff else 0
      val b1 = if (a.bytes.length > 1) a.bytes(1) & 0xff else 0
      Decoded(a.id, a.modality, 16 + b0, 16 + b1, 1 + (a.bytes.length % 31), a.bytes.length.toLong)
    }
  }

  /** Synthesize an asset table from documents (text bytes stand in for media
   * payloads; the pipeline does not care what the bytes mean). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(
        col("doc_id").as("id"),
        lit("synthetic/text").as("modality"),
        encode(col("text"), "UTF-8").as("bytes"),
        col("source")
      )
      .as[Asset]
  }

  /** Batched decode stage: mapPartitions so a real decoder could amortize
   * per-batch setup (codec contexts, GPU handles) across a partition —
   * the Scala analogue of pandas-UDF batch shape. */
  def decodeAll(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(FakeDecoder.decode))
  }

  /** Metadata/feature query (oracle-checked subset: everything here is also
   * computable by DuckDB over the raw text bytes). */
  def features(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("bigint").as("byte_len"),
        md5(col("text")).as("payload_md5"),
        (lit(16) + ascii(substring(col("text"), 1, 1))).cast("int").as("fake_width"),
        (lit(16) + ascii(substring(col("text"), 2, 1))).cast("int").as("fake_height")
      )
      .orderBy("doc_id")

  /** One sampled video frame: the schema contract of the frame-sampling
   * stage (payload omitted here; a real decoder would carry
   * `frame_bytes: Array[Byte]`). */
  final case class Frame(id: Long, frame_idx: Int, ts_ms: Long, out_w: Int, out_h: Int)

  /**
   * Frame sampling + resize: treat each asset as a video with
   * `n_frames` (stub-derived), emit every 5th frame with a 2x downscaled
   * output geometry. The frame-index generation is DECLARATIVE —
   * `explode(sequence(0, n_frames-1, 5))` stays inside whole-stage codegen
   * and Catalyst knows the output estimate — rather than a per-row loop in
   * `mapPartitions`. Row-count amplification (~n_frames/5 per asset) is the
   * scale hazard of this stage: at 100 TB follow the explode with
   * `repartition()` sized to the amplified row count before any wide
   * downstream op, so post-explode partitions stay executor-memory-sized.
   * The per-frame decode itself would ride in [[decodeAll]]'s batched
   * `mapPartitions` shape; here the geometry math stands in for it.
   */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id").as("id"),
        (octet_length(col("text")) % 31 + 1).as("n_frames"),
        (lit(16) + ascii(substring(col("text"), 1, 1))).as("w"),
        (lit(16) + ascii(substring(col("text"), 2, 1))).as("h")
      )
      .select(
        col("id"),
        explode(expr("sequence(0, n_frames - 1, 5)")).as("frame_idx"),
        col("w"), col("h")
      )
      .select(
        col("id"),
        col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * 40L).cast("bigint").as("ts_ms"),
        (col("w") / 2).cast("int").as("out_w"),
        (col("h") / 2).cast("int").as("out_h")
      )
      .orderBy("id", "frame_idx")

  /** Byte-histogram features through the custom Catalyst expression
   * (rows-only check: no DuckDB analogue iterates blob bytes). */
  def byteHistograms(spark: SparkSession, dir: String): DataFrame = {
    ByteHistogram.register(spark)
    val a = assets(spark, dir).toDF()
    a.select(
      col("id"),
      expr("byte_histogram(bytes, 16)").as("hist")
    ).select(
      col("id"),
      expr("aggregate(hist, 0L, (acc, x) -> acc + x)").as("total_bytes"),
      expr("array_position(hist, array_max(hist))").cast("bigint").as("modal_bin"),
      concat_ws(",", col("hist")).as("hist_csv")
    ).orderBy("id")
  }
}
