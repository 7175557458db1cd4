package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application (MERGE INTO semantics) and
  * slowly-changing-dimension type-2 history — the warehouse ingest
  * layer a 100-TB pipeline needs when a dimension arrives as a
  * changelog stream rather than full snapshots.
  *
  * Scale shape: both operators are one shuffle on the business key.
  * [[applyChangelog]] first collapses the changelog to its latest row
  * per key (window top-1 — the changelog, not the base, pays the
  * sort), then joins base-vs-latest once; with a changelog far
  * smaller than the base, Catalyst/AQE broadcasts the collapsed
  * frame and the base never shuffles at all. [[scd2]] is a single
  * per-key window pass (row_number + lead), no self-join — the
  * classic "join each version to the next" formulation would shuffle
  * the history twice.
  */
object Cdc {

  /** Latest change per key: top-1 by (ts, tieBreak) descending. The
    * tie-break column must make the ordering total (e.g. a changelog
    * sequence number) or "latest" is nondeterministic.
    */
  private def latestPerKey(changes: DataFrame, key: String, ts: String,
                           tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).desc, col(tieBreak).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MERGE INTO semantics: apply a CDC changelog to a base snapshot.
    *
    * For each key, the LATEST change (by `ts`, tie-broken by
    * `tieBreak`) wins: op == `deleteOp` removes the key from the
    * result; any other op upserts — existing rows get the `setCols`
    * assignments ((changelogCol -> baseCol) pairs), keys absent from
    * the base are inserted with the assigned columns set and every
    * other base column NULL. Base rows never touched by the changelog
    * pass through unchanged. Equivalent to the SQL:
    * {{{
    * MERGE INTO base USING latest_changes ON base.key = changes.key
    *   WHEN MATCHED AND op = 'D' THEN DELETE
    *   WHEN MATCHED THEN UPDATE SET ...
    *   WHEN NOT MATCHED AND op <> 'D' THEN INSERT ...
    * }}}
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, key: String,
                     changeKey: String, ts: String, tieBreak: String,
                     opCol: String, deleteOp: String,
                     setCols: Seq[(String, String)]): DataFrame = {
    require(setCols.nonEmpty, "need at least one SET assignment")
    val assigned = setCols.map(_._2).toSet
    require(!assigned.contains(key), "cannot assign the merge key")
    val last = latestPerKey(changes, changeKey, ts, tieBreak)
      .select(col(changeKey).as("__ck") +: col(opCol).as("__op") +:
        setCols.map { case (cc, bc) => col(cc).as(s"__set_$bc") }: _*)
    base.join(last, col(key) === col("__ck"), "full_outer")
      // a delete for a key the base never had is a no-op (the join
      // row exists but both branches drop it)
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(base.columns.toIndexedSeq.map { c =>
        if (c == key) coalesce(col(key), col("__ck")).as(key)
        else if (assigned(c))
          when(col("__op").isNotNull, col(s"__set_$c")).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
  }

  /** SCD type-2 history from a changelog: one row per observed
    * version of `attrs` per key, with `valid_from` = the change's
    * `ts`, `valid_to` = the NEXT change's ts (NULL while current),
    * a 1-based `version` number and an `is_current` flag. Single
    * window pass over the changelog partitioned by key — the ordering
    * (ts, tieBreak) must be total per key.
    */
  def scd2(changes: DataFrame, key: String, ts: String, tieBreak: String,
           attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    changes
      .select((key +: ts +: tieBreak +: attrs).distinct.map(col): _*)
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("valid_from", col(ts))
      .select((key +: attrs).map(col) ++
        Seq(col("version"), col("valid_from"), col("valid_to"),
            col("is_current")): _*)
  }
}
