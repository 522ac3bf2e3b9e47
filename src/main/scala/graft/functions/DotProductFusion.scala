package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative dot-product fold
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             0.0d, (acc, e) -> acc + e)
  *
  * over two float arrays into the codegen'd [[VectorDot]] — so a user who
  * writes the idiomatic higher-order form gets the fused loop for free
  * (injected via `spark.sql.extensions=graft.GraftExtensions`, or
  * `spark.experimental.extraOptimizations`).
  *
  * The rewrite is exactly semantics-preserving, which is why it can be an
  * optimizer rule at all:
  * - element order: VectorDot sums left-to-right in double, bit-identical
  *   to the fold;
  * - mismatched lengths: zip_with null-pads, the padded null nulls the
  *   whole fold → NULL; VectorDot returns NULL on mismatch (post-r2);
  * - null ELEMENTS null the fold the same way → VectorDot returns NULL on
  *   any null element, so containsNull=true arrays fuse safely;
  * - empty arrays → 0.0, null input array → NULL, in both forms.
  *
  * Anything that deviates from the canonical shape (no casts — a float
  * multiply is NOT the same arithmetic; a non-zero or MINUS-zero seed —
  * the guard is bit-level, -0.0 + x is not 0.0 + x; a non-identity
  * finish; swapped operands in the merge) is deliberately left untouched.
  */
object DotProductFusion extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean =
    e.resolved && DataType.equalsIgnoreNullability(e.dataType, ArrayType(FloatType))

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case nv: NamedLambdaVariable => nv.exprId == v.exprId
        case _                       => false
      }
    case _ => false
  }

  private def sameVar(ref: Expression, v: NamedLambdaVariable): Boolean = ref match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _                       => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(xc, yc, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(accRef, elRef, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(finRef, Seq(fin: NamedLambdaVariable), _))
        if zero != null &&
          java.lang.Double.doubleToLongBits(zero.asInstanceOf[Double]) == 0L &&
          isFloatArray(a) && isFloatArray(b) &&
          isDoubleCastOf(xc, x) && isDoubleCastOf(yc, y) &&
          sameVar(accRef, acc) && sameVar(elRef, el) &&
          sameVar(finRef, fin) =>
      VectorDot(a, b)
  }
}
