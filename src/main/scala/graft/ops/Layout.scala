package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout kernels: clustering keys that make a 100 TB table
  * prunable on MORE than one column.
  *
  * A table sorted on `user_id` answers user-range scans from a few
  * row groups but reads everything for a time-range scan (and vice
  * versa). Interleaving the bits of both columns into one Z-order
  * (Morton) key and sorting on THAT bounds every file's span in BOTH
  * dimensions, so parquet min/max stats prune either predicate —
  * the standard multi-dimensional clustering layout (Delta/Iceberg
  * `OPTIMIZE ZORDER` do exactly this server-side).
  */
object Layout {

  /** Morton key: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1; `bits` low bits of each input are interleaved (21+21 fits
    * a long with room to spare). Inputs must be non-negative; values
    * ≥ 2^bits alias high bits — bucket or `pmod` wider domains first.
    * Pure shift/and/add column arithmetic: codegen-friendly, and
    * replayable in any engine with integer bit ops (the q109 oracle).
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }
  }

  /** Range-partition + sort by `key` — the write-side layout step
    * before `.write.parquet`. Each output file covers one contiguous
    * key range, so with a [[zOrderKey]] key every file's min/max is
    * tight in BOTH interleaved dimensions (LayoutSpec measures the
    * span contraction directly). */
  def clusterBy(df: DataFrame, key: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, key).sortWithinPartitions(key)
}
