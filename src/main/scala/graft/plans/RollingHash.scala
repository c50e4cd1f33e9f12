package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL w-codepoint sliding-window
  * polynomial hashes of a string in one O(len) pass — element k
  * (0-based) is [[CharHash]]'s fold over the window ENDING at
  * codepoint position w + k (1-based), i.e. bit-identical to
  * `charHash(substr(s, k + 1, w))` for every k; empty array when the
  * string is shorter than one window.
  *
  * This is the CDC hot path (graft.functions.TextKit.cdcBoundaries):
  * the composable formulation — charHash(substr) inside a
  * filter-over-sequence HOF — re-folds w characters AND allocates a
  * substring per position, O(len * w) with per-position garbage,
  * interpreted per element (HOFs are CodegenFallback). The rolling
  * recurrence h' = ((h - cp_out * mult^(w-1)) * mult + cp_in) mod p
  * pays O(1) per position with zero allocation beyond the one output
  * array, and the whole loop runs inside whole-stage codegen via a
  * static helper call. Measured on q_dedup_cdc_chunks at sf0.1: the
  * boundary scan drops from dominating the query to noise.
  *
  * DETERMINISM CONTRACT: codepoint iteration and modular residues are
  * exactly [[CharHash]]'s (every intermediate stays in [0, p); the
  * subtraction is re-normalized before reuse, and all products fit a
  * Long: (p-1) * mult < 2^36, cp_out * pow < 2^52). Property-tested
  * bit-equal to the per-position substring fold in PropertySpec.
  */
case class RollingHash(child: Expression, w: Int, mult: Int, p: Long)
    extends UnaryExpression {

  require(w >= 1, s"window must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String], w, mult.toLong, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.RollingHash.compute($c, $w, ${mult}L, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {

  /** The O(len) rolling pass (static so generated code can call it). */
  def compute(s: UTF8String, w: Int, mult: Long, p: Long): ArrayData = {
    val str = s.toString
    // one codepoint pass: n = codepoint count, cp = codepoint values
    val cp = new Array[Int](str.length)
    var n = 0
    var i = 0
    while (i < str.length) {
      val c = str.codePointAt(i)
      cp(n) = c
      n += 1
      i += Character.charCount(c)
    }
    if (n < w) return new GenericArrayData(Array.empty[Long])
    // mult^(w-1) mod p, by repeated multiplication (w is small)
    var pow = 1L
    var j = 1
    while (j < w) { pow = pow * mult % p; j += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (h * mult + cp(i)) % p; i += 1 }
    out(0) = h
    var k = 1
    while (k <= n - w) {
      // drop cp(k-1), admit cp(k+w-1); re-normalize into [0, p) before
      // the multiply so every intermediate matches the per-step fold
      val dropped = (h - cp(k - 1) * pow % p + p) % p
      h = (dropped * mult + cp(k + w - 1)) % p
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }
}
