package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout keys for scan pruning at scale.
  *
  * Z-ordering (Morton, "A computer oriented geodetic data base", IBM
  * 1966; the technique behind Delta/Iceberg OPTIMIZE ZORDER): bit-
  * interleave two bounded dimension keys so that sorting by the
  * combined key clusters BOTH dimensions. Files written in Z order
  * carry tight per-file/row-group min-max ranges on every interleaved
  * column, so range predicates on any of them prune scans — the
  * single-dimension sort only prunes its leading column. Pure
  * codegen'd integer bit ops; no UDF.
  */
object Layout {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a single Z value: bit i of x lands at 2i, bit i
    * of y at 2i+1. Inputs must already be bounded to `bits` bits
    * (use pmod/bucketing upstream); 2*bits must stay < 31.
    */
  def zorder2(x: Column, y: Column, bits: Int = 10): Column = {
    require(bits >= 1 && 2 * bits < 31, s"bits out of range: $bits")
    (0 until bits)
      .flatMap { i =>
        Seq(
          shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i),
          shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
        )
      }
      .reduce(_ bitwiseOR _)
  }

  /** DuckDB replay of [[zorder2]], generated with the same bit count
    * so oracles can verify the layout key exactly.
    */
  def zorder2Sql(x: String, y: String, bits: Int = 10): String = {
    require(bits >= 1 && 2 * bits < 31, s"bits out of range: $bits")
    (0 until bits)
      .flatMap { i =>
        Seq(
          s"((($x >> $i) & 1) << ${2 * i})",
          s"((($y >> $i) & 1) << ${2 * i + 1})"
        )
      }
      .mkString("(", " | ", ")")
  }
}
