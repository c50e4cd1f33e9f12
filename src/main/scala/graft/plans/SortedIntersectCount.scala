package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: intersection size of two pre-sorted
  * string arrays by linear merge.
  *
  * Extension-point demonstration per the engine's preference order
  * (builder brief; SURVEY.md §7.3): compose built-ins first, custom
  * `Expression` with `doGenCode` where per-element interpreted
  * overhead matters, UDF as last resort. This replaces the
  * TextKit.sortedIntersectCount UDF rung: same merge, but generated
  * into whole-stage codegen with no row/Seq conversion at the
  * boundary.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<string> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0;
         |int $j = 0;
         |${ev.value} = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { ${ev.value}++; $i++; $j++; }
         |  else if ($c < 0) { $i++; }
         |  else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): SortedIntersectCount = copy(left = newLeft, right = newRight)
}
