package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * The reference stages its tables into a columnar warehouse
  * (`fotmob-dag.py:179-183`) but leaves layout to the engine; at 100 TB
  * the layout IS the query performance. Partitioning on one column
  * prunes one predicate dimension; interleaving the BITS of two
  * range-binned dimensions into one Morton code gives a single
  * clustering key under which a 2-D box predicate touches only the
  * covering Z-tiles — the Delta/Iceberg `OPTIMIZE ZORDER BY` shape,
  * here as a first-class operator over plain hive-partitioned parquet.
  *
  * Determinism contract (oracle-portable): each dimension is binned by
  * pure INTEGER arithmetic over its global min/max —
  * `least(nBins-1, (v - mn) * nBins div (mx - mn + 1))` — and the bit
  * interleave is exact long arithmetic, so DuckDB re-derives every
  * tile id bit-for-bit. No sampling, no RNG (a range-partitioner
  * sample would differ per engine/run).
  *
  * Scale notes: the global min/max is one 1-row aggregate (broadcast
  * scalar); binning + Morton is a shuffle-free projection; the write
  * repartitions by tile so each of the (2^tileBits)² directories is
  * one task's output, not #tasks small files. Within a tile, a
  * production table would additionally sort by the full-resolution
  * Z-value so parquet row-group min/max skipping nests inside the
  * directory pruning — at test scale directory pruning is the
  * observable effect (SinkSpec pins `PartitionFilters`).
  */
object Layout {

  /** Interleave the low 16 bits of two non-negative long columns into
    * a 32-bit Morton code: bit j of `x` lands at bit 2j, bit j of `y`
    * at bit 2j+1. Classic magic-number bit spread — five shift/mask
    * steps per dimension, all inside whole-stage codegen. */
  def morton16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  private def spread16(v: Column): Column = {
    var s = v.bitwiseAND(lit(0xFFFFL))
    s = s.bitwiseOR(shiftleft(s, 8)).bitwiseAND(lit(0x00FF00FFL))
    s = s.bitwiseOR(shiftleft(s, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    s = s.bitwiseOR(shiftleft(s, 2)).bitwiseAND(lit(0x33333333L))
    s.bitwiseOR(shiftleft(s, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Driver-side twin of [[morton16]] for covering-tile enumeration. */
  def mortonLocal(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  /** Range-bin a value column to `1 << bits` integer bins over the
    * CLOSED domain [mn, mx]: monotone, engine-exact arithmetic (the
    * operands are small exact integers, so the double division is
    * correctly rounded and its floor equals integer division in any
    * engine). `least` guards v = mx landing one past the end. */
  def bin(v: Column, mn: Column, mx: Column, bits: Int): Column =
    least(lit(((1 << bits) - 1).toLong),
      floor((v - mn).cast("double") * (1 << bits)
        / ((mx - mn).cast("double") + 1d)).cast("long"))

  /** Driver-side twin of [[bin]]. */
  def binLocal(v: Long, mn: Long, mx: Long, bits: Int): Long =
    math.min((1L << bits) - 1, (v - mn) * (1 << bits) / (mx - mn + 1))

  /** All Morton tile ids whose (binX, binY) tile intersects the
    * rectangle [bxLo, bxHi] × [byLo, byHi] — a 2-D box predicate's
    * covering set. Bin monotonicity makes the covering exact: every
    * row satisfying the box lands in one of these tiles. */
  def coveringTiles(
      bxLo: Long, bxHi: Long, byLo: Long, byHi: Long): Seq[Long] =
    (for {
      bx <- bxLo to bxHi
      by <- byLo to byHi
    } yield mortonLocal(bx, by)).sorted

  /** Z-tile id for a row: Morton code of the two range-binned
    * dimensions. With `bits` bits per dimension the table fans into
    * (2^bits)² tiles. */
  def zTile(
      x: Column, y: Column,
      mnX: Column, mxX: Column, mnY: Column, mxY: Column,
      bits: Int): Column =
    morton16(bin(x, mnX, mxX, bits), bin(y, mnY, mxY, bits)).cast("int")
}
