package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: sequential-fold dot product of two
  * double arrays.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order formulation in
  * VectorKit on the similarity hot paths: HOFs evaluate interpreted
  * (one closure call per element, boxing at every step), while this
  * generates a tight primitive loop into whole-stage codegen.
  *
  * DETERMINISM CONTRACT: the accumulation is a strict left-to-right
  * double fold — sum = ((0 + x0*y0) + x1*y1) + ... — exactly the
  * order the HOF fold and DuckDB's list_cosine_similarity over
  * DOUBLE[] use, so results stay bit-identical to the oracles.
  * Mismatched lengths fold over the shorter prefix (zip_with would
  * null-pad; the queries only compare equal-dimension embeddings).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): DotProduct = copy(left = newLeft, right = newRight)
}
