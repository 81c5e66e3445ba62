package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{FloatDotProduct, ShingleGenerator}

/** Catalyst optimizer rule: auto-vectorize the declarative dot-product
  * pattern. A user writing the idiomatic higher-order-function form
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, (acc, v) -> acc + v)
  *
  * gets the interpreted HOF evaluator (no whole-stage codegen, a lambda
  * frame per element). This rule rewrites the exact pattern — float-array
  * inputs, double-cast multiply, 0.0 seed, additive merge, identity
  * finish — to [[FloatDotProduct]], whose generated loop is ~100× faster
  * and bit-identical (same left-to-right double accumulation). Installed
  * via [[GraftExtensions]] or `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isDoubleCastOfVar(e: Expression): Boolean = e match {
    case Cast(_: NamedLambdaVariable, DoubleType, _, _) => true
    case _ => false
  }

  private def isCastPairMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x, y, _), _, _) =>
      isDoubleCastOfVar(x) && isDoubleCastOfVar(y)
    case _ => false
  }

  private def isAdditiveMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _) => true
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(v2: NamedLambdaVariable), _) =>
      v.exprId == v2.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(l, r, zipF), Literal(0.0, DoubleType), mergeF, finishF)
        if isFloatArray(l) && isFloatArray(r) && isCastPairMultiply(zipF) &&
          isAdditiveMerge(mergeF) && isIdentityFinish(finishF) =>
      FloatDotProduct(l, r)
  }
}

/** `SparkSessionExtensions` installer — the engine's extension surface in
  * one place: the auto-vectorization rule plus the custom function and
  * generator, so `spark.sql.extensions=graft.plans.GraftExtensions` gives
  * any session the full engine vocabulary without per-query registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectOptimizerRule(_ => AsOfJoinPruning)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[graft.functions.ShingleGenerator].getName, "graft_shingles"),
      (exprs: Seq[Expression]) =>
        graft.functions.ShingleGenerator(exprs(0), exprs(1).eval().asInstanceOf[Int])))
  }
}
