package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * `vec_sum(array<bigint>)` — element-wise sum of fixed-dimension long
 * vectors, as a typed `Aggregator` (SURVEY §2.5's custom-UDAF tier).
 *
 * This is the shuffle-light dual of the posexplode shape used by
 * [[graft.operators.VectorOps.labelCentroids]]: posexplode ships `dim`
 * rows per vector through the (key, pos) shuffle but stays fully
 * codegen'd; the Aggregator ships ONE partially-summed buffer per
 * (task, key) — `dim`x less shuffle volume — at the cost of the typed
 * (non-codegen) aggregate path. Below ~100 groups per task the buffer
 * dedup dominates and this wins; with millions of sparse groups the
 * exploded rows partial-aggregate just as well and codegen wins. Both are
 * exact (long addition commutes), so they verify against each other —
 * see the OperatorsSpec property.
 *
 * Null elements are not expected (quantize with a non-null expression
 * first); a null INPUT array contributes nothing (treated as zero).
 */
class VectorSumAgg(dim: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  override def zero: Array[Long] = new Array[Long](dim)

  override def reduce(buf: Array[Long], a: Array[Long]): Array[Long] = {
    if (a != null) {
      require(a.length == dim, s"vec_sum: expected dim $dim, got ${a.length}")
      var i = 0
      while (i < dim) { buf(i) += a(i); i += 1 }
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object VectorSumAgg {
  /** Register `vec_sum_<dim>` for SQL use; idempotent. */
  def register(spark: SparkSession, dim: Int): Unit =
    spark.udf.register(s"vec_sum_$dim", udaf(new VectorSumAgg(dim)))
}
