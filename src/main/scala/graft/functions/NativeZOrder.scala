package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, NullType}

/** Native Morton (z-order) interleave — the codegen'd form of the
  * 32-term shift/mask chain `ScaleOps.interleave16Composed` builds from
  * built-ins. The composed chain is correct and codegen'd, but every
  * row walks 32 shift-and-or expression nodes; this expression runs
  * the classic 4-step bit-spread (magic masks) per operand — ~10 ALU
  * ops per side — and is BIT-IDENTICAL to the composed form
  * (spec-asserted over random 16-bit pairs). The DuckDB oracle keeps
  * the explicit shift/mask SQL (`ScaleOps.interleaveSql`), which the
  * equivalence spec ties to this expression transitively.
  */
object NativeZOrder {

  /** `z_interleave16(x, y)`: interleave the low 16 bits of x (even bit
    * positions) and y (odd positions) into a 32-bit Morton code. */
  case class ZInterleave16(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType | NullType, LongType | NullType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "z_interleave16"

    override protected def nullSafeEval(x: Any, y: Any): Any =
      NativeZOrder.morton16(x.asInstanceOf[Long], y.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = graft.functions.NativeZOrder.morton16($x, $y);")

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 16-bit value spread to even bit positions (0, 2, 4, …, 30). */
  def spread16(v0: Long): Long = {
    var v = v0 & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Morton code of the low 16 bits of (x, y); public + static for the
    * generated code. */
  def morton16(x: Long, y: Long): Long = spread16(x) | (spread16(y) << 1)

  def zInterleave16(x: Column, y: Column): Column =
    GraftBridge.column(ZInterleave16(GraftBridge.expression(x), GraftBridge.expression(y)))
}
