package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The north-star composite (BASELINE.json): an LLM training-data curation
 * pass over the documents table, as ONE Catalyst plan —
 *
 *   quality gate (length/punctuation/stopword score)
 *   -> near-duplicate removal (MinHash-LSH pairs; smallest doc_id survives)
 *   -> language ID + token counts on the survivors.
 *
 * Every stage is the already-oracle-checked operator; the composition is
 * itself oracle-checked end to end. Scale shape: the dedup stage is the only
 * shuffle-heavy part (LSH-bounded), the gates are map-side, and the final
 * join against the loser set is a broadcast (near-dup losers are a tiny
 * fraction of any real corpus).
 */
object CurationPipeline {

  def curate(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score_k"), col("n_tokens"))
    val lang = TextOps.langId(spark, dir).select(col("doc_id"), col("lang_pred"))
    // near-dup pairs a < b: the larger doc_id of each pair is dropped
    val losers = DedupOps.minhashPairs(spark, dir).select(col("b").as("doc_id")).distinct()
    quality
      .filter(col("quality_score_k") >= 300 && col("n_tokens") >= 20)
      .join(broadcast(losers), Seq("doc_id"), "left_anti")
      .join(lang, Seq("doc_id"))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"), col("quality_score_k"))
      .orderBy("doc_id")
  }

  /**
   * Multimodal joint curation: a document survives only if its TEXT passes
   * the quality gate AND its paired EMBEDDING (doc_id = vec_id) is not the
   * loser of a cosine near-dup pair — the cross-modal compose every
   * image+caption / audio+transcript pipeline runs. Scale shape: the
   * doc-embedding equi-join shuffles on the shared key (or is free if both
   * tables are bucketed by id, see BucketingSpec); the embedding-dedup
   * loser set is (label x derived-k IVF cluster)-blocked
   * ([[VectorOps.embeddingDedupBlocked]] — the label-only variant's fixed
   * blocking cardinality went quadratic in the r8 100x sweep) and
   * broadcasts as an anti-join build side.
   */
  def jointCuration(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score_k"), col("n_tokens"))
    val losers = VectorOps.embeddingDedupBlocked(spark, dir).select(col("b").as("vec_id")).distinct()
    val emb = Tables.t(spark, dir, "embeddings").select(col("vec_id"), col("label"))
    quality
      .filter(col("quality_score_k") >= 300 && col("n_tokens") >= 20)
      .join(emb, col("doc_id") === col("vec_id"))
      .join(broadcast(losers), Seq("vec_id"), "left_anti")
      .select(col("doc_id"), col("label"), col("quality_score_k"))
      .orderBy("doc_id")
  }
}
