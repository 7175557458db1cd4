package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BinaryExpression, Expression, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Branchless SWAR bytewise max over two longs that each pack EIGHT
  * independent unsigned bytes, every byte `< 0x80` (the HyperBall
  * register lattice: values 0..45). Top-level object with no companion
  * class, so scalac emits STATIC forwarders and the generated code
  * calls it as a plain static method (the JaroWinklerKernel
  * convention).
  *
  * The trick (Hacker's Delight §2; values < 128 so per-byte
  * subtraction never borrows across byte boundaries):
  * `t = ((a|H) - b) & H` sets each byte's high bit iff `a_i >= b_i`;
  * `(t - (t >>> 7)) | t` widens that bit to a full 0xFF/0x00 byte
  * mask; the select is two ANDs and an OR. Zero branches, zero loops —
  * whole-stage codegen keeps it in registers.
  */
object Bytes8MaxKernel {
  private final val H = 0x8080808080808080L

  def max(a: Long, b: Long): Long = {
    val t = ((a | H) - b) & H
    val m = (t - (t >>> 7)) | t
    (a & m) | (b & ~m)
  }
}

/** `graft_bytes8_max(a, b)`: elementwise max of two longs packing 8
  * unsigned bytes each (every byte `< 0x80` — callers own that
  * invariant; the HyperBall registers are `<= 45`). The packed twin of
  * `greatest()` over 8 separate columns: one codegen'd long op instead
  * of eight comparisons, and an 8x narrower row through every exchange
  * that carries it.
  */
case class Bytes8Max(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bytes8_max expects (bigint, bigint), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "bytes8_max"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Bytes8MaxKernel.max(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Bytes8MaxKernel.max($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Bytes8Max =
    copy(left = l, right = r)
}

/** `graft_bytes8_max_agg(g)`: the bytewise-max FOLD of [[Bytes8Max]]
  * over a group — HLL register max-union for registers packed 8-per-
  * long. A [[DeclarativeAggregate]] with a single mutable LongType
  * buffer, so it rides `HashAggregateExec`'s UnsafeRow fast path WITH
  * map-side partial aggregation and whole-stage codegen (a binary/
  * array buffer would demote the whole sweep aggregate to
  * SortAggregate — the reason the HyperBall counter packs into longs,
  * not one binary blob). Identity is 0L: registers are non-negative,
  * so the all-zeros counter is the fold's neutral element. Null inputs
  * are skipped (never produced by the HyperBall sweep; defensive).
  */
case class Bytes8MaxAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bytes8_max_agg expects bigint, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bytes8_max_agg"

  private lazy val bwmax =
    AttributeReference("bwmax", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bwmax)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), bwmax, Bytes8Max(bwmax, child)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Bytes8Max(bwmax.left, bwmax.right))
  override lazy val evaluateExpression: Expression = bwmax

  override protected def withNewChildInternal(newChild: Expression): Bytes8MaxAgg =
    copy(child = newChild)
}
