package graft.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) layout keys — the multi-dimensional clustering
 * technique warehouse formats use for data skipping (Delta OPTIMIZE
 * ZORDER BY, Iceberg sort orders): interleaving the bits of two sort
 * dimensions puts rows close in EITHER dimension close in the single
 * sort key, so range-partitioned files carry narrow min/max envelopes on
 * BOTH columns and a filter on either dimension prunes most files. A
 * plain lexicographic sort gives this only for the leading column.
 *
 * The key is pure integer bit arithmetic (16 bits per dimension, 32-bit
 * z-value) built from shifts and masks — deterministic, engine-neutral,
 * and exactly mirrorable in SQL, unlike library-private z-order
 * implementations. Map-only; the layout cost is the one range
 * repartition + in-partition sort of the write itself.
 */
object Layout {

  /** Bits kept per dimension (z-value = 2 * DimBits wide). */
  val DimBits = 16

  /** Morton-interleave two integer columns (each clamped to
    * [0, 2^16)): bit i of `a` lands at z-bit 2i, bit i of `b` at
    * z-bit 2i+1. Built as a 32-term shift/mask sum — codegen-friendly
    * integer ops, no UDF. */
  def zValue(a: Column, b: Column): Column = {
    val ca = least(greatest(a.cast("long"), lit(0L)), lit((1L << DimBits) - 1))
    val cb = least(greatest(b.cast("long"), lit(0L)), lit((1L << DimBits) - 1))
    (0 until DimBits).map { i =>
      val bitA = shiftright(ca, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
      val bitB = shiftright(cb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      bitA + bitB
    }.reduce(_ + _)
  }

  /** The identical 32-term expression as engine-neutral SQL over column
    * expressions `a` and `b` (already clamped/integer), for the DuckDB
    * oracle — generated from the same loop so the two can never drift. */
  def zValueSql(a: String, b: String): String =
    (0 until DimBits).map { i =>
      s"(((($a) >> $i) & 1) * ${1L << (2 * i)} + ((($b) >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")
}
