package graft.plans

import java.util.Comparator

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: priority dedup of tagged ids.
  *
  * Input: `array<struct<..., id: string, priority: int, ...>>` (field
  * order free, extra fields ignored). Output: `array<string>` holding
  * one entry per distinct id — the best (lowest) priority wins — sorted
  * by (priority asc, id asc).
  *
  * Re-expresses the reference's protein-id cleanup UDF
  * (target/Target.scala:565-593 `cleanProteinIds`: dedup ids across
  * prioritized sources, best source wins, priority-ordered output) one
  * rung above both the UDF and the pure-HOF formulations: the
  * ColumnKit.priorityDedup chain (2 sorts + fold/filter + 2 transforms)
  * evaluates interpreted per element and costs ~5s on 20k rows at
  * sf0.1, while this is a single hash-dedup + sort kernel invoked from
  * whole-stage codegen. Null elements, null ids and null priorities
  * (treated as worst) follow the UDF's drop/last semantics.
  */
case class PriorityDedupIds(child: Expression) extends UnaryExpression {

  private lazy val structType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idOrdinal: Int = structType.fieldIndex("id")
  private lazy val priorityOrdinal: Int = structType.fieldIndex("priority")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fields.exists(f => f.name == "id" && f.dataType == StringType) &&
          st.fields.exists(f => f.name == "priority" && f.dataType == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<id: string, priority: int>>, got " +
          other.catalogString)
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "priority_dedup_ids"

  override def nullSafeEval(v: Any): Any =
    PriorityDedupIds.dedup(
      v.asInstanceOf[ArrayData], structType.size, idOrdinal, priorityOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // The kernel is a hash-dedup + sort — too branchy to inline as
    // generated source, so the generated code calls the companion's
    // static forwarder (the standard pattern for complex kernels; the
    // call stays inside the whole-stage-codegen'd projection).
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PriorityDedupIds.dedup(" +
        s"$c, ${structType.size}, $idOrdinal, $priorityOrdinal);")

  override protected def withNewChildInternal(newChild: Expression): PriorityDedupIds =
    copy(child = newChild)
}

object PriorityDedupIds {

  /** Kernel shared by eval and codegen. Returned UTF8Strings reference
    * the input buffer — valid for the duration of the current row's
    * evaluation, same contract Spark's own ArrayDistinct relies on.
    */
  def dedup(arr: ArrayData, numFields: Int, idOrd: Int, prOrd: Int): ArrayData = {
    val n = arr.numElements()
    val best = new java.util.HashMap[UTF8String, Integer](math.max(8, n * 2))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, numFields)
        if (!row.isNullAt(idOrd)) {
          val id = row.getUTF8String(idOrd)
          val pr: Integer =
            if (row.isNullAt(prOrd)) Integer.MAX_VALUE else row.getInt(prOrd)
          val old = best.get(id)
          if (old == null || pr < old) best.put(id, pr)
        }
      }
      i += 1
    }
    val entries =
      best.entrySet().toArray(new Array[java.util.Map.Entry[UTF8String, Integer]](0))
    java.util.Arrays.sort(entries, EntryOrder)
    val out = new Array[Any](entries.length)
    i = 0
    while (i < entries.length) { out(i) = entries(i).getKey; i += 1 }
    new GenericArrayData(out)
  }

  private object EntryOrder extends Comparator[java.util.Map.Entry[UTF8String, Integer]] {
    override def compare(
        a: java.util.Map.Entry[UTF8String, Integer],
        b: java.util.Map.Entry[UTF8String, Integer]): Int = {
      val c = Integer.compare(a.getValue, b.getValue)
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
  }
}
