package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: bit-interleave two bounded integer columns so
  * that sorting by the single z-value clusters BOTH dimensions at once —
  * the layout lever behind Delta/Iceberg's OPTIMIZE ZORDER. A table
  * range-partitioned and sorted by z gives every file/row-group a narrow
  * min/max envelope on BOTH source columns, so a two-dimensional box
  * predicate prunes row groups that a single-column sort could only prune
  * on one axis (ZOrderSpec measures the scan-row reduction directly).
  *
  * The Spark `Column` and the DuckDB SQL twin are generated from the SAME
  * per-bit loop (shift-and-mask arithmetic both engines implement
  * identically on BIGINT), so the oracle stays in lockstep with the
  * implementation by construction. Inputs must be non-negative and below
  * 2^bits; the z-value is below 2^(2·bits). All terms are plain long
  * arithmetic inside whole-stage codegen — no UDF.
  */
object ZOrder {

  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }

  /** The identical computation as ANSI SQL over expressions `a`/`b`. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a) >> $i) & 1) * ${1L << (2 * i)}",
      s"((($b) >> $i) & 1) * ${1L << (2 * i + 1)}")).mkString(" + ")
}
