package graft.ops

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Persist-lifecycle registry for the stage-before-fanout pattern.
  *
  * Operators that fan one computed frame out to several consumers in a
  * single plan (MinHash shingle/signature tables, LSH embedding
  * staging) persist the staged frame so the action evaluates it once.
  * But the operator returns a LAZY result — it cannot unpersist before
  * its caller runs the action — so round 2 leaked one MEMORY_AND_DISK
  * block per call for the life of the session (55-query Verify/Bench
  * sessions accumulate eviction churn; see ADVICE r2).
  *
  * `stage` records every persisted frame here; the query harness
  * (Verify/Bench, or any embedding application) calls [[releaseAll]]
  * after the action that consumed the result. Long-lived caches that
  * are SUPPOSED to span queries (FinComposite's memoized FinData)
  * deliberately do not go through this registry.
  *
  * SCOPE: the registry is process-global and [[releaseAll]] releases
  * EVERYTHING staged so far — the contract is one query harness
  * driving queries sequentially (the Verify/Bench shape). Concurrent
  * drivers sharing a JVM would release each other's staged frames;
  * that costs recomputation of the staged subtree mid-query (the
  * persist is a work-dedup optimization), never wrong results. A
  * concurrent embedder should drive its queries through its own
  * sequential harness thread or accept the recompute.
  */
object Staging {

  private val staged = new ConcurrentLinkedQueue[DataFrame]()
  private val stagedRdds = new ConcurrentLinkedQueue[RDD[_]]()

  // THREAD-LOCAL staging scopes (r19): a perpetual driver — a
  // foreachBatch ingest loop — must release its own batch's staged
  // frames without draining the process-global registry out from
  // under a co-resident query (releaseAll per micro-batch would
  // unpersist the other pipeline's fan-out frames mid-query: correct
  // but a continuous cache-thrash). Inside [[scoped]], frames staged
  // BY THIS THREAD register to the innermost scope and are released
  // on exit; other threads' staging is untouched.
  private val scopeTl =
    new ThreadLocal[java.util.ArrayDeque[java.util.ArrayList[DataFrame]]] {
      override def initialValue() =
        new java.util.ArrayDeque[java.util.ArrayList[DataFrame]]()
    }

  /** Run `body` with a thread-confined staging scope: every [[stage]]
    * call made on this thread inside `body` is unpersisted when the
    * scope exits (after the consuming actions — run them INSIDE the
    * body). Nests; checkpoint registration ([[stageCheckpoint]]) is
    * deliberately not scoped — iterative sweeps manage their own
    * checkpoint succession. */
  def scoped[T](body: => T): T = {
    val scopes = scopeTl.get()
    val frames = new java.util.ArrayList[DataFrame]()
    scopes.push(frames)
    try body
    finally {
      scopes.pop()
      frames.forEach(df => df.unpersist(blocking = false))
    }
  }

  // Unpersisting a locally-checkpointed RDD logs a WARN ("lineage has
  // been truncated and cannot be recomputed") from the RDD-class
  // logger on every call. Here that is the DESIGNED lifecycle — a
  // checkpoint is only dropped once its successor is materialized and
  // nothing can re-read it — so the warning is a per-sweep false
  // alarm; mute that one logger (it logs nothing else at WARN).
  try org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.rdd.MapPartitionsRDD",
    org.apache.logging.log4j.Level.ERROR)
  catch { case _: Throwable => () } // logging backend absent: cosmetic only

  /** Persist `df` (MEMORY_AND_DISK) and register it for release —
    * to the innermost thread-local [[scoped]] scope if one is open on
    * this thread, else to the process-global registry. */
  def stage(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val scopes = scopeTl.get()
    if (!scopes.isEmpty) scopes.peek().add(df) else staged.add(df)
    df
  }

  /** Register a `localCheckpoint()`ed frame's backing RDD blocks for
    * release. A local checkpoint persists through the RDD layer, not
    * the frame, so `unpersist` on the DataFrame cannot reach it —
    * before round 9 the connected-components sweeps' MEMORY_AND_DISK
    * blocks were freed only when the ContextCleaner happened to GC
    * them, which let them leak into the NEXT query's measurement
    * (Bench's "persists are released between queries" invariant held
    * for staged frames but not checkpoints). Returns `df` unchanged;
    * frames whose plan is not a bare checkpoint scan register nothing.
    */
  def stageCheckpoint(df: DataFrame): DataFrame = {
    checkpointRdd(df).foreach(stagedRdds.add)
    df
  }

  /** Immediately free a superseded checkpoint's blocks (an
    * iterative-algorithm frame that no later computation reads — a
    * checkpointed RDD CANNOT be recomputed, so only call this once the
    * successor frame is materialized). No-op for non-checkpoint
    * frames; idempotent. */
  def dropCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))

  private def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case g: org.apache.spark.sql.execution.GraftPinnedRDD => Some(g.rdd)
      case l: LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Unpersist every staged frame and checkpoint block (non-blocking)
    * and clear the registry. Safe to call when nothing is staged. */
  def releaseAll(): Unit = {
    var df = staged.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = staged.poll()
    }
    var rdd = stagedRdds.poll()
    while (rdd != null) {
      rdd.unpersist(blocking = false)
      rdd = stagedRdds.poll()
    }
  }
}
