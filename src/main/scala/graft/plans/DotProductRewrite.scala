package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.DotProductF32

/** Optimizer rule (SURVEY §4 extension recipe, SparkSessionExtensions
  * path c): rewrites the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D,
  *             (acc, v) -> acc + v)
  *
  * over float arrays into the codegen'd [[DotProductF32]] — semantics are
  * identical for ALL inputs: same fixed-order IEEE arithmetic, and
  * DotProductF32 replicates zip_with's null-padding behavior (unequal
  * lengths or a null element → NULL result), so installing the rule never
  * changes query results. The rewrite just moves the loop from
  * interpreted higher-order lambdas into whole-stage codegen. Users keep writing the idiomatic declarative
  * form; the optimizer picks the fast operator — the Spark-first answer
  * to "custom operator" (vs. asking users to call a UDF).
  *
  * Installed via [[graft.GraftExtensions]] (spark.sql.extensions) or
  * `GraftExtensions.installOptimizations(spark)` on a live session.
  */
object DotProductRewrite extends Rule[LogicalPlan] {
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(
              Cast(x: NamedLambdaVariable, DoubleType, _, _),
              Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
              zipArgs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(accL: NamedLambdaVariable,
            accR: NamedLambdaVariable, _), _, _),
          LambdaFunction(fin: NamedLambdaVariable, _, _))
        if isFloatArray(a) && isFloatArray(b) &&
          zero == 0.0 &&
          zipArgs.map(_.exprId).toSet == Set(x.exprId, y.exprId) &&
          accL.exprId != accR.exprId =>
        DotProductF32(a, b)
    }
}
