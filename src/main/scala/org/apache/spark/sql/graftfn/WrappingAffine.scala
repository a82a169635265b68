package org.apache.spark.sql.graftfn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/**
 * `a * h + b` over longs with JAVA WRAPPING semantics — the affine universal-hash lane
 * step MinHash needs (graft.ops.Dedup). Spark's ANSI mode (default in 4.x) makes the
 * built-in `*`/`+` throw on overflow, but a hash lane WANTS mod-2^64 wrap-around; this
 * expression restores two's-complement arithmetic inside whole-stage codegen so the lane
 * computation stays a native aggregate input instead of a per-row UDF.
 */
case class WrappingAffine(a: Expression, h: Expression, b: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = a
  override def second: Expression = h
  override def third: Expression = b
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "wrap_affine"

  override def nullSafeEval(av: Any, hv: Any, bv: Any): Any =
    av.asInstanceOf[Long] * hv.asInstanceOf[Long] + bv.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, hv, bv) => s"${ev.value} = $av * $hv + $bv;")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(a = newFirst, h = newSecond, b = newThird)
}
