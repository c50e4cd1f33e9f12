package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's shared column-expression library.
  *
  * Re-expresses the reference's helper kit
  * (etl/backend/spark/Helpers.scala) as pure, codegen-friendly Spark
  * column functions — no UDFs on the hot path, every function stays
  * inside whole-stage codegen.
  */
object ColumnKit {

  // --------------------------------------------------------------------
  // Cross-engine-deterministic numeric aggregation.
  //
  // Summing IEEE doubles is order-dependent, and partial aggregation
  // makes the order nondeterministic run to run. All money-like sums in
  // this engine therefore run in exact DECIMAL arithmetic, are rescaled
  // to 2 decimals (HALF_UP) while still exact, and only then converted
  // to double — giving bit-identical results on any partitioning, any
  // cluster size, and any SQL engine that follows the same recipe.
  // --------------------------------------------------------------------

  private val D18_4 = DecimalType(18, 4)
  private val D38_2 = DecimalType(38, 2)

  /** Exact decimal view of a money-ish double column (<=4 meaningful dp). */
  def dec4(c: Column): Column = c.cast(D18_4)

  /** Order-independent exact sum of a money-like column, as double. */
  def decSum(c: Column): Column = sum(dec4(c)).cast(D38_2).cast(DoubleType)

  /** Exact decimal sum of an already-decimal expression, as double. */
  def decSumExpr(e: Column): Column = sum(e).cast(D38_2).cast(DoubleType)

  /** lineitem revenue term, exact: extendedprice * (1 - discount). */
  def revenueTerm(price: Column, discount: Column): Column =
    dec4(price) * (lit(1).cast(D18_4) - dec4(discount))

  /** Deterministic mean: exact sum divided by count in one double op. */
  def decAvg(c: Column): Column = decSum(c) / count(c)

  // --------------------------------------------------------------------
  // Array / struct kit (reference Helpers.scala).
  // --------------------------------------------------------------------

  /** Harmonic-sum relevance score over an array column: sort desc, then
    * sum(element_i / i^2). Reference: Helpers.scala:262-267 and
    * literature/Processing.scala:18-23. Pure higher-order functions —
    * no UDAF, fully distributed, map-side combinable when composed with
    * collect_list per group.
    */
  def harmonicSum(arr: Column): Column = {
    val sorted = sort_array(arr, asc = false)
    aggregate(
      zip_with(sorted, sequence(lit(1), greatest(size(sorted), lit(1))), (e, i) => e / (i * i)),
      lit(0.0),
      (acc, x) => acc + coalesce(x, lit(0.0))
    )
  }

  /** Max theoretical harmonic sum for a vector of n ones (used by the
    * reference to normalize scores, literature/Processing.scala:25-27).
    */
  def maxHarmonicSum(n: Column): Column =
    aggregate(
      transform(sequence(lit(1), greatest(n, lit(1))), i => lit(1.0) / (i * i)),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** Null-safe array union (reference Helpers.scala:346-347): treats a
    * null array as empty rather than poisoning the union.
    */
  def safeArrayUnion(cols: Column*): Column = {
    require(cols.nonEmpty, "safeArrayUnion needs at least one column")
    cols
      .map(c => when(c.isNull, array()).otherwise(c))
      .reduce(array_union)
  }

  /** Flatten an array-of-arrays, drop nulls and duplicates
    * (reference `mkFlattenArray`, Helpers.scala:134-146).
    */
  def flattenDistinct(c: Column): Column =
    array_distinct(filter(flatten(filter(c, x => x.isNotNull)), x => x.isNotNull))

  /** Concatenate N array columns then flatten+dedup+clean — the
    * reference's `flattenCat` SQL macro (Helpers.scala:154-167) without
    * the string-interpolated SQL.
    */
  def flattenCat(cols: Column*): Column =
    flattenDistinct(array(cols: _*))

  /** Collapse selected columns into a single struct column
    * (reference `nest`, Helpers.scala:310-318).
    */
  def nest(df: DataFrame, columns: Seq[String], structName: String): DataFrame =
    df.withColumn(structName, struct(columns.map(col): _*))
      .drop(columns.filterNot(_ == structName): _*)

  /** Strip everything up to the last '/' — URI suffix extraction
    * (reference `stripIDFromURI`, Helpers.scala:124-125).
    */
  def stripIdFromUri(c: Column): Column = substring_index(c, "/", -1)

  /** Cast an array-of-anonymous-structs column to a declared struct
    * schema (reference TargetUtils.transformArrayToStruct,
    * target/TargetUtils.scala:14-25: build structs positionally, then
    * cast to the Encoder-derived type).
    */
  def castArrayToStruct(c: Column, elementSchema: StructType): Column =
    c.cast(ArrayType(elementSchema))

  /** Two-phase aggregation for skewed keys (builder brief: salting).
    * Phase 1 groups on (key, salt) — the hot key's rows spread over
    * `salts` reducers — phase 2 merges the partials on the key alone.
    * The salt is a deterministic hash of a distinguishing column (NOT
    * rand(): reproducibility recipe), so results are stable on any
    * cluster. Use when one key dominates a sum/count aggregate; for
    * skewed *joins* prefer AQE skew-join (on by default in Session).
    */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltFrom: String,
      salts: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(saltFrom)), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(dec4(col(valueCol))).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).cast(D38_2).cast(DoubleType).as(s"sum_$valueCol"))
  }

  /** Priority dedup of an array<struct<priority:int,id:string>>: keep
    * the best (lowest) priority per id, order by (priority, id), return
    * the ids. Re-expresses the reference's protein-id cleanup UDF
    * (target/Target.scala:565-593 cleanProteinIds) as pure array
    * expressions: sort id-major, drop adjacent duplicates (keeping the
    * better priority), re-sort priority-major.
    */
  def priorityDedup(pairs: Column): Column = {
    // id-major sort puts the best priority first within each id, so
    // adjacent-dedup retains exactly the best entry per id. The dedup
    // is a single aggregate() fold: the accumulator is a *value*, so
    // nothing upstream re-evaluates per element (an element_at(self, i)
    // formulation re-runs the whole sort pipeline per element —
    // measured at ~20x this cost).
    val idMajor = array_sort(
      transform(pairs, p => struct(p.getField("id").as("id"), p.getField("priority").as("priority")))
    )
    val kept = aggregate(
      idMajor,
      slice(idMajor, 1, 0), // typed empty accumulator
      (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1).getField("id") === x.getField("id"),
          acc
        ).otherwise(concat(acc, array(x)))
    )
    transform(
      array_sort(
        transform(kept, p => struct(p.getField("priority").as("priority"), p.getField("id").as("id")))
      ),
      p => p.getField("id")
    )
  }

  /** Linear-time variant of [[priorityDedup]] for hot paths: takes an
    * ALREADY-MATERIALIZED column holding the id-major-sorted pairs
    * (array<struct<id,priority>> sorted ascending, so the best
    * priority is first within each id run) and keeps each run's head
    * via an indexed filter against the bound column — O(n) per row
    * where the fold in priorityDedup copies its accumulator per
    * element (O(n^2)). The input MUST be its own projected column, not
    * an inline expression: referencing an expression inside its own
    * lambda re-evaluates it per element (the 20x CSE trap, see
    * README determinism/perf notes), while a bound column is computed
    * once per row. CollapseProject keeps the materialization because
    * the alias is non-cheap and multiply-referenced.
    */
  def priorityDedupIndexed(sortedPairs: Column): Column =
    transform(
      array_sort(
        transform(
          filter(
            sortedPairs,
            (x, i) =>
              (i === 0) ||
                (x.getField("id") =!= element_at(sortedPairs, i).getField("id"))
          ),
          p => struct(p.getField("priority").as("priority"), p.getField("id").as("id"))
        )
      ),
      p => p.getField("id")
    )

  // --------------------------------------------------------------------
  // Schema surgery.
  // --------------------------------------------------------------------

  /** Union two frames with different schemas: pad each side's missing
    * columns with typed nulls, then unionByName
    * (reference Helpers.scala:209-239).
    */
  def unionDifferentSchema(a: DataFrame, b: DataFrame): DataFrame = {
    val aCols = a.schema.map(f => f.name -> f.dataType).toMap
    val bCols = b.schema.map(f => f.name -> f.dataType).toMap
    val aPadded = bCols.keysIterator.filterNot(aCols.contains).foldLeft(a) { (df, c) =>
      df.withColumn(c, lit(null).cast(bCols(c)))
    }
    val bPadded = aCols.keysIterator.filterNot(bCols.contains).foldLeft(b) { (df, c) =>
      df.withColumn(c, lit(null).cast(aCols(c)))
    }
    aPadded.unionByName(bPadded)
  }

  /** Recursively rename every field in a schema (reference
    * Helpers.scala:248-295 rebuilds StructType for snake->lowerCamel).
    * Applied with `spark.createDataFrame(df.rdd, renameSchema(...))`-free
    * casting: we instead cast each top-level column to its renamed type,
    * which stays inside Catalyst.
    */
  def renameSchema(schema: StructType, rename: String => String): StructType = {
    def renameType(dt: DataType): DataType = dt match {
      case st: StructType =>
        StructType(st.fields.map(f => f.copy(name = rename(f.name), dataType = renameType(f.dataType))))
      case ArrayType(et, n)      => ArrayType(renameType(et), n)
      case MapType(kt, vt, n)    => MapType(renameType(kt), renameType(vt), n)
      case other                 => other
    }
    renameType(schema).asInstanceOf[StructType]
  }

  /** Apply a recursive rename to a DataFrame by casting columns to the
    * renamed nested types — stays a pure projection (no RDD round-trip,
    * unlike the reference's createDataFrame(df.rdd, newSchema)).
    */
  def renameAllColumns(df: DataFrame, rename: String => String): DataFrame = {
    val newSchema = renameSchema(df.schema, rename)
    val cols = df.schema.fields.zip(newSchema.fields).map { case (oldF, newF) =>
      col(oldF.name).cast(newF.dataType).as(newF.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** snake_case -> lowerCamel, the reference's house rename
    * (Helpers.scala:248-260).
    */
  val snakeToLowerCamel: String => String = s => {
    val parts = s.split("_").filter(_.nonEmpty)
    if (parts.isEmpty) s
    else (parts.head +: parts.tail.map(p => p.head.toUpper.toString + p.tail)).mkString
  }

  /** Assert required columns are present (reference `validateDF`,
    * Helpers.scala:327-333).
    */
  def validateDF(required: Set[String], df: DataFrame): Unit = {
    val missing = required -- df.columns.toSet
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(",")}")
  }

  /** Wide -> long melt (reference `transposeDataframe`,
    * Helpers.scala:186-200). Spark 4 has a built-in `unpivot`; the
    * reference's explode(array(struct(lit(name), col))) idiom is kept
    * only as documentation.
    */
  def melt(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      varName: String = "variable",
      valName: String = "value"
  ): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valName)

  // --------------------------------------------------------------------
  // Deterministic output helpers (oracle parity).
  // --------------------------------------------------------------------

  /** Collected set as a canonical string: sorted, comma-joined. Collect
    * order is nondeterministic under partial aggregation, so all
    * collected outputs cross the verification boundary in this form.
    */
  def sortedSetString(c: Column): Column =
    array_join(sort_array(collect_set(c)), ",")

  /** Round a transcendental-function result for cross-engine compare:
    * libm vs java.lang.Math differ by <=1 ulp, far inside 1e-6.
    */
  def round6(c: Column): Column = round(c, 6)
}
