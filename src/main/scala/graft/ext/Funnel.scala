package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users
  * reached step i by performing its event STRICTLY AFTER their
  * (earliest-completion) time of step i-1. Min-time semantics — each
  * step's time is the user's earliest qualifying occurrence — which
  * makes the result deterministic and the oracle a chain of min
  * aggregates, not a path search.
  */
object Funnel {

  /** Returns (step_idx, step, n_users), one row per step in order.
    *
    * Scale shape: every join and aggregate keys on `userCol`, so the
    * per-user frame partitioning from step 1 is REUSED by every later
    * step (co-partitioned joins, no re-shuffle); the event scan per
    * step pushes `typeCol = step` into the parquet scan. Each
    * `reached` frame (one row per surviving user) is staged before
    * its double consumption (next step's join + this step's count).
    * Counts are assembled as a union of 1-row aggregates — no driver
    * collect.
    */
  def steps(events: DataFrame, userCol: String, typeCol: String,
            tsCol: String, stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    require(stepTypes.distinct.size == stepTypes.size,
      "repeated step types are ambiguous under min-time semantics")
    var reached = graft.ops.Staging.stage(
      events.filter(col(typeCol) === stepTypes.head)
        .groupBy(userCol).agg(min(tsCol).as("__t")))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(0).as("step_idx"), lit(stepTypes.head).as("step"),
              col("n_users"))
    stepTypes.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = graft.ops.Staging.stage(
        events.filter(col(typeCol) === st)
          .join(reached, Seq(userCol))
          .filter(col(tsCol) > col("__t"))
          .groupBy(userCol).agg(min(tsCol).as("__t")))
      out = out.union(reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step_idx"), lit(st).as("step"), col("n_users")))
    }
    out
  }
}
