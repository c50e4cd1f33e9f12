package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine-portable polynomial string
  * hash, fold(codepoints)(acc = (acc * mult + cp) mod p).
  *
  * Replaces TextKit.charHash's higher-order formulation
  * `aggregate(filter(split(s, ""), ...), 0L, (acc, ch) => pmod(...))`
  * on the text hot paths: Spark's higher-order functions are
  * CodegenFallback — one interpreted closure call per CHARACTER, with
  * a per-character array allocation from the split — while this
  * generates a tight primitive loop into whole-stage codegen
  * (fingerprinting, SimHash's per-word hashing, corpus shuffle/mixture
  * keys, KMV sketch input all sit on it).
  *
  * DETERMINISM CONTRACT: iterates CODE POINTS, exactly like the HOF
  * version (Java's split("") keeps surrogate pairs whole and ascii()
  * reads the code point) and the DuckDB mirror (OracleSql.foldSql,
  * unicode(c)). acc stays in [0, p) and cp <= 0x10FFFF, so
  * acc * mult + cp never overflows a Long for any mult < 2^32.
  * Property-tested bit-equal to the HOF fold in PropertySpec.
  */
case class CharHash(child: Expression, mult: Int, p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "char_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * mult + cp) % p
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |${ev.value} = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  ${ev.value} = (${ev.value} * ${mult}L + $cp) % ${p}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharHash =
    copy(child = newChild)
}
