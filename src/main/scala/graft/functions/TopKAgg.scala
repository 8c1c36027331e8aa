package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * `topk_cos_<k>(score double, id bigint)` — grouped top-k as a typed
 * `Aggregator`: each task keeps at most k (score, id) pairs per group and
 * partial buffers merge associatively, so a grouped top-k over N rows
 * shuffles only `groups x tasks x k` tuples instead of N rows through a
 * window. This is THE distributed top-k shape for batched KNN
 * ([[graft.operators.VectorOps.batchKnn]]): Spark's window-function
 * formulation (`row_number() OVER (PARTITION BY qid ORDER BY score)`)
 * must shuffle every (query, candidate) pair to its query's partition
 * first — corpus x queries rows — where this aggregator reduces them
 * map-side to k per query per task.
 *
 * Determinism: the total order is (score DESC, id ASC) — ties on the
 * (bit-identical) score resolve by id, so the kept set and its order never
 * depend on partitioning or merge order.
 *
 * The k≤~100 regime this targets keeps buffers tiny; the O(k log k)
 * sort-insert per row is dwarfed by the score computation feeding it.
 */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def best(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (c, id) => (-c, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    // a full candidate below the current floor can't enter: skip the sort
    if (buf.lengthCompare(k) >= 0 && {
          val (fc, fid) = buf.last
          x._1 < fc || (x._1 == fc && x._2 > fid)
        }) buf
    else best(buf :+ x)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(a ++ b)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

object TopKAgg {
  /** Register `topk_cos_<k>` for SQL use; idempotent. */
  def register(spark: SparkSession, k: Int): Unit =
    spark.udf.register(s"topk_cos_$k", udaf(new TopKAgg(k)))
}
