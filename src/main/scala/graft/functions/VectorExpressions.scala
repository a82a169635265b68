package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftfn.{DotProduct, Fnv1a64, NnTop1Agg, SimhashAgg, WrappingAffine}

/** Public registration/API surface for the custom vector expressions
  * (see org.apache.spark.sql.graftfn.DotProduct). */
object VectorFunctions {

  /** Register `dot_product` in the session's function registry so it is usable from both
    * the Column API (via call_function) and SQL. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("wrap_affine"),
      new ExpressionInfo(classOf[WrappingAffine].getName, "wrap_affine"),
      (children: Seq[Expression]) => WrappingAffine(children.head, children(1), children(2)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      (children: Seq[Expression]) => Fnv1a64(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "simhash_agg"),
      (children: Seq[Expression]) => SimhashAgg(children.head).toAggregateExpression())
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nn_top1"),
      new ExpressionInfo(classOf[NnTop1Agg].getName, "nn_top1"),
      (children: Seq[Expression]) => NnTop1Agg(children.head, children(1)).toAggregateExpression())
  }

  /** Column-API sugar: registers on first use, then resolves through the registry. */
  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
  }
}
