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

  /** Contiguous Hilbert-key ranges covering the inclusive box
    * [x0,x1]×[y0,y1] — the READ side of Hilbert clustering: a table
    * laid out by [[graft.functions.HilbertKey]] answers a 2-D box
    * predicate as a handful of 1-D key-range scans (each prunable by
    * parquet min/max stats), plus the exact box predicate as a
    * residual filter.
    *
    * Quadtree descent: a size-2^m cell aligned on its grid owns a
    * CONTIGUOUS key block of 4^m aligned keys (the defining Hilbert
    * recursion), so cells fully inside the box emit their block,
    * boundary cells refine. `maxRanges` bounds the clause count the
    * way real index planners do: once reached, boundary cells emit
    * their whole block (over-covering — never missing), and the
    * residual predicate restores exactness. Unbounded, the cover is
    * exact and O(perimeter) ranges; LayoutSpec pins both regimes
    * against brute-force enumeration. Driver-side planning is
    * O(ranges · bits) — microseconds; the scan itself never shuffles.
    */
  def hilbertCover(x0: Long, x1: Long, y0: Long, y1: Long,
                   bits: Int = 21, maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(x0 <= x1 && y0 <= y1, "empty box")
    require(x0 >= 0 && y0 >= 0 && x1 < (1L << bits) && y1 < (1L << bits),
      s"box outside the 2^$bits grid")
    val hk = graft.functions.HilbertKernel
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def cellRange(cx: Long, cy: Long, m: Int): (Long, Long) = {
      val s2 = 1L << (2 * m)
      val d0 = (hk.xy2d(cx, cy, bits) / s2) * s2
      (d0, d0 + s2)
    }
    def go(cx: Long, cy: Long, m: Int): Unit = {
      val sz = 1L << m
      if (cx > x1 || cx + sz - 1 < x0 || cy > y1 || cy + sz - 1 < y0) return
      if ((cx >= x0 && cx + sz - 1 <= x1 && cy >= y0 && cy + sz - 1 <= y1) ||
          m == 0 || out.size >= maxRanges) {
        out += cellRange(cx, cy, m)
        return
      }
      val h = sz / 2
      go(cx, cy, m - 1); go(cx + h, cy, m - 1)
      go(cx, cy + h, m - 1); go(cx + h, cy + h, m - 1)
    }
    go(0L, 0L, bits)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out.sortBy(_._1).foreach { case (a, b) =>
      if (merged.nonEmpty && merged.last._2 >= a) {
        val (pa, pb) = merged.remove(merged.size - 1)
        merged += ((pa, math.max(pb, b)))
      } else merged += ((a, b))
    }
    merged.toSeq
  }

  /** Range-partition + sort by `key` — the write-side layout step
    * before `.write.parquet`. Each output file covers one contiguous
    * key range, so with a [[zOrderKey]] key every file's min/max is
    * tight in BOTH interleaved dimensions (LayoutSpec measures the
    * span contraction directly). */
  def clusterBy(df: DataFrame, key: Column, numFiles: Int): DataFrame =
    df.repartitionByRange(numFiles, key).sortWithinPartitions(key)
}
