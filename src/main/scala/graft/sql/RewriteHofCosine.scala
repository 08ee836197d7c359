package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule rewriting the composable higher-order-function cosine
  * pattern (`VectorFunctions.cosine`: `aggregate(zip_with(a,b,*),0,+)`
  * dot/norms with the zero-norm guard) into the codegen'd
  * [[CosineSimilarity]] expression.
  *
  * HOFs are interpreted — they fall out of whole-stage codegen and
  * allocate a lambda frame per array element — so a user who writes the
  * composable form (or composes `VectorFunctions.dot`/`norm2` by hand)
  * pays ~10x on the ANN hot path. The accumulation order of the native
  * expression matches the sequential HOF fold, so this rewrite is
  * bit-exact, not just approximately equal.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`), the Spark-
  * sanctioned extension point for plan rewrites (SURVEY §2 custom-operator
  * preference: compose > native Expression > LogicalPlan+Rule).
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  /** aggregate(zip_with(x, y, (p, q) => p * q), 0.0, (acc, v) => acc + v) */
  private object DotOf {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(x, y,
              LambdaFunction(
                Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
            zero,
            LambdaFunction(
              Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
            _)
          if isZero(zero) => Some((x, y))
      case _ => None
    }
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }

  /** sqrt(dot(x, x)) */
  private object NormOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(DotOf(x, y)) if x.semanticEquals(y) => Some(x)
      case _ => None
    }
  }

  private def coerce(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CaseWhen(
          Seq((Or(EqualTo(NormOf(a1), z1), EqualTo(NormOf(b1), z2)), z3)),
          Some(Divide(DotOf(a2, b2), Multiply(NormOf(a3), NormOf(b3), _), _)))
        if isZero(z1) && isZero(z2) && isZero(z3) &&
          a1.semanticEquals(a2) && a2.semanticEquals(a3) &&
          b1.semanticEquals(b2) && b2.semanticEquals(b3) =>
      CosineSimilarity(coerce(a2), coerce(b2))
  }
}
