package graft.functions

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/**
 * `argmin_pair(dist, id)` — the id whose (dist, id) pair is minimal, i.e.
 * exactly `min_by(id, struct(dist, id))`, but HASH-AGGREGABLE.
 *
 * Why it exists: `min_by`/`max_by` (and `min(struct(...))`) carry a STRUCT
 * aggregation buffer, which `HashAggregateExec` cannot hold in its unsafe
 * row map — the plan silently falls back to SortAggregate, which SORTS the
 * whole input. For the hierarchical IVF assignment's leg 2 the input is
 * the exploded (vector x probed-cell x cell-member) candidate relation —
 * hundreds of millions of rows at k=70,000 — and the r9 planted-corpus
 * sweep caught that sort spilling to disk for minutes (the same
 * SortAggregate trap as the r8 crossJoin+min_by finding, one level up).
 * This aggregate keeps the buffer as TWO primitive slots (best dist:
 * double, best id: int), so it stays in whole-stage-codegen'd
 * HashAggregate with map-side partial aggregation: each task collapses its
 * candidates to one row per group before any shuffle.
 *
 * Tie-break: strictly `dist <, then id <` — identical to
 * `min_by(id, struct(dist, id))` AND to the flat [[IvfArgmin]] kernel's
 * first-minimum strict-< scan over ascending ids, so hierarchical and flat
 * assignment stay bit-identical (HierarchicalAssignSpec).
 *
 * Null inputs contribute nothing (the comparison yields null, `If` takes
 * the keep-buffer branch). An all-null/empty group evaluates to
 * `Int.MaxValue` — callers group by keys that exist, so every group has at
 * least one non-null candidate row.
 */
case class ArgminPair(dist: Expression, id: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = dist
  override def right: Expression = id
  override def prettyName: String = "argmin_pair"
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType

  private lazy val bestD = AttributeReference("bestD", DoubleType, nullable = false)()
  private lazy val bestId = AttributeReference("bestId", IntegerType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bestD, bestId)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Double.PositiveInfinity), Literal(Int.MaxValue))

  override lazy val updateExpressions: Seq[Expression] = {
    val takes = Or(LessThan(dist, bestD), And(EqualTo(dist, bestD), LessThan(id, bestId)))
    Seq(If(takes, dist, bestD), If(takes, id, bestId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val takes = Or(
      LessThan(bestD.right, bestD.left),
      And(EqualTo(bestD.right, bestD.left), LessThan(bestId.right, bestId.left)))
    Seq(If(takes, bestD.right, bestD.left), If(takes, bestId.right, bestId.left))
  }

  override lazy val evaluateExpression: Expression = bestId

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminPair =
    copy(dist = newLeft, id = newRight)
}
