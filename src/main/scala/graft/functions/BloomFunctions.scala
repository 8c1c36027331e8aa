package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/**
 * SQL registration for Spark's built-in-but-unregistered bloom-filter
 * expressions. Spark ships `BloomFilterAggregate` / `BloomFilterMightContain`
 * for its own runtime-filter injection without exposing them in the
 * FunctionRegistry; large-scale decontamination wants them first-class —
 * the contamination reference set compresses to a fixed-size bitmap
 * broadcast (bits chosen up front) instead of a broadcast of the full
 * shingle set, and the membership probe stays inside whole-stage codegen.
 *
 *  - `bloom_agg(xxhash64_value, est_items, num_bits)` -> binary sketch
 *  - `bloom_contains(sketch, xxhash64_value)` -> boolean (no false negatives)
 */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    reg.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }
}
