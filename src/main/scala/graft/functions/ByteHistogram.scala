package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/**
 * `byte_histogram(binary, bins)` — bucketed byte-value histogram of a binary
 * payload, as a native Catalyst expression with whole-stage codegen.
 *
 * This is the custom-Expression tier of the preference order (SURVEY §4):
 * no composition of built-ins can iterate the bytes of a BinaryType column,
 * and a Scala UDF would box every row. Used by the multimodal feature
 * pipeline as the deterministic stand-in for real image/audio feature
 * extraction (the decode itself is stubbed; this plumbing is real).
 */
case class ByteHistogram(child: Expression, bins: Int) extends UnaryExpression {
  require(bins > 0 && bins <= 256 && 256 % bins == 0, s"bins must divide 256, got $bins")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    if (child.dataType == BinaryType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"byte_histogram needs BINARY input, got ${child.dataType.catalogString}")
  }
  override def prettyName: String = "byte_histogram"

  private val shift = Integer.numberOfTrailingZeros(256 / bins)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val hist = new Array[Long](bins)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) >>> shift) += 1L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(hist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hist = ctx.freshName("hist")
      val i = ctx.freshName("i")
      s"""
         |long[] $hist = new long[$bins];
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $hist[($c[$i] & 0xFF) >>> $shift]++;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($hist);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram = copy(child = newChild)
}

object ByteHistogram {
  /** Register `byte_histogram(binary, bins)` for SQL/expr use; idempotent.
   * (Registry + `expr(...)` keeps us off the non-public Column<->Expression
   * bridge in the Spark 4 unified Column API.) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_histogram",
      { exprs =>
        val bins = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"bins must be an int literal, got $other")
        }
        ByteHistogram(exprs.head, bins)
      },
      "scala_udf"
    )
}
