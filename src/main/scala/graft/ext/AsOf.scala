package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively (composed
  * from built-ins per the preference order in the build guide: union +
  * window beats a custom SparkPlan here because it is one shuffle and
  * stays inside whole-stage codegen).
  *
  * For each left row (key, t), attach the payload of the right row
  * with the same key and the greatest right-time <= t (ties broken by
  * right rows sorting before left rows at equal time, i.e. inclusive
  * `<=` semantics, matching DuckDB's ASOF JOIN).
  *
  * Scale: both sides shuffle once on `key`; the merge is a single
  * window pass per key partition. No per-key collect, no cross
  * product — holds for arbitrarily large sides. Skewed keys can be
  * pre-salted by callers if one key dominates.
  */
object AsOf {

  /** @param left       left (probe) side
    * @param right      right (reference) side; should be deduplicated
    *                   on (key, time) for deterministic payloads
    * @param leftKey    join key column name on the left
    * @param rightKey   join key column name on the right
    * @param leftTime   event-time column on the left
    * @param rightTime  event-time column on the right
    * @param payload    right-side columns to attach
    * @param toleranceSeconds  optional match window (pandas
    *                   merge_asof `tolerance`): a left row only takes
    *                   the payload when its matched right row is at
    *                   most this many seconds older — stale
    *                   references (a quote from last month "as of"
    *                   today) surface as nulls instead of silently
    *                   joining. Same single-shuffle plan: the scan
    *                   additionally carries the matched right TIME
    *                   and the gap test is a map-side filter.
    */
  def joinBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   payload: Seq[String],
                   toleranceSeconds: Option[Long] = None): DataFrame = {
    val (unioned, leftCols) =
      unionSides(left, right, leftKey, rightKey, leftTime, rightTime, payload)
    // Right rows (__side=0) sort before left rows at equal time: <=.
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .withColumn("__lastT",
        last(when(col("__side") === 0, col("__t")), ignoreNulls = true)
          .over(w))
      .filter(col("__side") === 1)
    val inTol = toleranceSeconds match {
      case Some(tol) =>
        col("__lastT").isNotNull &&
          unix_micros(col("__t")) - unix_micros(col("__lastT")) <=
            tol * 1000000L
      case None => lit(true)
    }
    payload.foldLeft(matched)((df, p) =>
        df.withColumn(p, when(inTol, col("__last")(p))))
      .select((leftCols ++ payload).toIndexedSeq.map(col): _*)
  }

  /** FORWARD as-of join: for each left row (key, t), attach the
    * payload of the right row with the same key and the SMALLEST
    * right-time >= t (inclusive — pandas
    * `merge_asof(direction='forward')`; the "next quote after the
    * order" / "next event after the snapshot" lookup). Identical
    * single-shuffle union + one-window-pass shape as
    * [[joinBackward]], with the SCAN reversed instead of the frame:
    * ordering by time DESCENDING, the right rows already seen are
    * exactly those with time >= the current row's, and the most
    * recently seen one has the smallest such time — so the same
    * running `last(..., ignoreNulls)` over [unbounded preceding,
    * current] applies. (The naive [current, unbounded following]
    * frame expresses the same thing, but Spark re-aggregates the
    * whole remaining frame per row — O(rows²) per key; measured 8 s
    * vs 0.5 s on a 1M-row grid at sf0.1.) Right rows sort before
    * left rows at equal time in the descending scan too, keeping
    * `>=` inclusive. */
  def joinForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  payload: Seq[String]): DataFrame = {
    val (unioned, leftCols) =
      unionSides(left, right, leftKey, rightKey, leftTime, rightTime, payload)
    // Descending time; right rows (__side=0) first at equal time: >=.
    val w = Window.partitionBy("__k").orderBy(col("__t").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned
      .withColumn("__first", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payload.foldLeft(matched)((df, p) => df.withColumn(p, col("__first")(p)))
      .select((leftCols ++ payload).toIndexedSeq.map(col): _*)
  }

  /** Shared merge prep: left rows tagged __side=1 carrying their own
    * columns, right rows tagged __side=0 carrying the payload struct;
    * both sides aligned to one schema for the single keyed union. */
  private def unionSides(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTime: String, rightTime: String,
                         payload: Seq[String]): (DataFrame, Array[String]) = {
    val leftCols = left.columns
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payload.map(col): _*).schema.fields)))
    val r = right
      .select((Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
                   lit(0).as("__side"), struct(payload.map(col): _*).as("__p")) ++
               leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select((Seq("__k", "__t", "__side", "__p").map(col) ++
                            leftCols.map(col)): _*)
      .unionByName(r)
    (unioned, leftCols)
  }
}
