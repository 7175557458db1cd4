package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the table-diff operator every
  * incremental pipeline needs for audit/backfill validation: given
  * two versions of a keyed table, classify every key as
  * added / removed / changed / unchanged and flag WHICH compare
  * columns changed. (The reference engine has no versioning surface;
  * this extends the CDC family — [[graft.ext.Cdc]] applies a
  * changelog, this DERIVES one from two materialized states.)
  *
  * Scale shape: ONE full-outer shuffle join on the key columns —
  * nothing else; the per-column comparisons are map-side expressions
  * over the join output, so cost is |v1|+|v2| through one exchange
  * regardless of how many columns are compared. Comparisons are
  * null-safe (`<=>`): a value moving to/from NULL counts as a
  * change, never as a silent equal.
  */
object Reconcile {

  /** Row-level diff of `v2` against `v1` on `keys`: returns one row
    * per key present in either side with `diff_status` ∈
    * added | removed | changed | unchanged and one boolean
    * `<c>_changed` per compare column (false for added/removed rows —
    * presence is the change there, column flags only qualify
    * `changed`). Key columns must be non-null and unique per side
    * (the usual primary-key contract; duplicate keys would
    * cross-multiply through the join). */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keys: Seq[String],
                   cols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(cols.nonEmpty, "need at least one compare column")
    val o = v1.select(
      keys.map(col) ++ cols.map(c => col(c).as(s"__o_$c")) :+
        lit(true).as("__in1"): _*)
    val n = v2.select(
      keys.map(col) ++ cols.map(c => col(c).as(s"__n_$c")) :+
        lit(true).as("__in2"): _*)
    val j = o.join(n, keys, "full_outer")
    val changedFlags = cols.map(c =>
      (coalesce(col("__in1"), lit(false)) &&
       coalesce(col("__in2"), lit(false)) &&
       !(col(s"__o_$c") <=> col(s"__n_$c"))).as(s"${c}_changed"))
    val anyChanged = cols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    val status = when(coalesce(col("__in1"), lit(false)) &&
                      !coalesce(col("__in2"), lit(false)), "removed")
      .when(!coalesce(col("__in1"), lit(false)), "added")
      .when(anyChanged, "changed")
      .otherwise("unchanged")
    j.select((keys.map(col) :+ status.as("diff_status")) ++ changedFlags: _*)
  }
}
