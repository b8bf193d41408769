package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.DotProductD

/** Catalyst optimizer rule: rewrite the naive higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[DotProductD]]. The HOF form is what a user
  * naturally writes, but Spark evaluates lambda HOFs interpreted — ~10x
  * slower on 64-dim vectors (see DotProductD scaladoc). The shapes are
  * semantically identical on EVERY input: both are a left-to-right double
  * fold of pairwise products, and DotProductD reproduces the HOF's NULL
  * behavior (mismatched lengths and NULL elements both yield NULL), so the
  * rewrite is safe on arrays whose element type is nullable
  * (containsNull=true) — RuleSpec locks this.
  *
  * Fires only on the exact shape (multiply inside zip_with, 0.0 init, add
  * fold, double arrays) — anything else is left untouched.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private object DoubleArrays {
    def unapply(e: Expression): Option[Expression] = e.dataType match {
      case t: org.apache.spark.sql.types.ArrayType if t.elementType == DoubleType => Some(e)
      case _ => None
    }
  }

  /** The multiply must use ONE variable from EACH zip_with argument —
    * (x,y)->x*y or (x,y)->y*x. Same-variable products like (x,y)->x*x are
    * sums of squares of one side, NOT a dot product, and must not match.
    */
  private def isCrossProduct(x: NamedLambdaVariable, y: NamedLambdaVariable,
                             lhs: Expression, rhs: Expression): Boolean =
    (lhs, rhs) match {
      case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
        (l.exprId == x.exprId && r.exprId == y.exprId) ||
          (l.exprId == y.exprId && r.exprId == x.exprId)
      case _ => false
    }

  private def isFold(acc: NamedLambdaVariable, v: NamedLambdaVariable,
                     lhs: Expression, rhs: Expression): Boolean =
    (lhs, rhs) match {
      case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
        (l.exprId == acc.exprId && r.exprId == v.exprId) ||
          (l.exprId == v.exprId && r.exprId == acc.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(DoubleArrays(a), DoubleArrays(b),
          LambdaFunction(Multiply(x1, y1, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(accRef, vRef, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        finish)
      if isCrossProduct(x, y, x1, y1) && isFold(acc, v, accRef, vRef) &&
        isIdentityFinish(finish) =>
      DotProductD(a, b)
  }

  /** aggregate()'s finish lambda must be the identity (id -> id) for the
    * rewrite to be value-preserving.
    */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}

/** SparkSessionExtensions entry point:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * Injects graft's optimizer rules into Catalyst. (Function registration
  * stays in Graft.init, which works on any already-built session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => RewriteGroupTopK)
    ext.injectPlannerStrategy(_ => GroupTopKStrategy)
  }
}
