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
