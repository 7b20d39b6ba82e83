package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Auto-unpersist for operator-internal scratch relations.
  *
  * Operators persist small index relations (shingle hashes, banded
  * buckets, LSH signatures, tf counts) that several branches of the
  * RETURNED lazy plan consume — the persist must outlive the method,
  * so the operator itself can never unpersist it. [[arm]] registers
  * the relation instead: a per-session [[QueryExecutionListener]]
  * unpersists it right after the first completed action whose analyzed
  * plan read it — which is by construction the caller's
  * materialization of the operator's result. A long-lived session
  * running many queries therefore does not accumulate cached scratch,
  * with no `clearCache()` contract on callers.
  *
  * Semantics notes:
  *   - Unpersisting is a cache hint — a caller running a SECOND action
  *     over the same result recomputes the scratch (correct, colder).
  *   - The listener bus is asynchronous: the sweep lands shortly after
  *     the action returns, not inside it.
  *   - Already-unpersisted entries (fast paths may unpersist
  *     explicitly) are dropped on the next sweep.
  *   - Spark's cache is PLAN-keyed: if two not-yet-materialized
  *     operator results share a scratch plan (e.g. the same
  *     shingle-hash relation), materializing the first sweeps the
  *     shared entry and the second recomputes it. Cost is a recompute,
  *     never wrong results.
  *   - Do NOT count on the RDD API to dodge the sweep: on Spark 4
  *     even materializing `df.rdd` posts an execution event
  *     (`withNewRDDExecutionId`), so the listener fires — verified
  *     the hard way in dedupServeBatch, whose internal shard-set
  *     collect must instead run BEFORE arming and over a plan no
  *     subtree of which sameResults the armed relation. Abandoned
  *     never-swept entries (plan-only workflows, results never
  *     materialized) are bounded by [[maxArmed]] (entry count) and
  *     [[maxArmedBytes]] (estimated bytes) — arming beyond either
  *     force-unpersists the oldest entries (oldest ≈ most likely
  *     abandoned).
  */
object ScratchCache {
  private case class Armed(df: DataFrame,
                           plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                           bytes: Long)
  private val armed = new ConcurrentLinkedQueue[Armed]()
  private val armedBytes = new java.util.concurrent.atomic.AtomicLong(0L)
  // weak keys: a stopped-and-dropped SparkSession must not be retained
  // just because an operator once armed scratch on it
  private val sessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Leak bound for never-swept entries (abandoned results, RDD-API
    * materialization): arming past this force-unpersists the oldest. */
  val maxArmed: Int = 64

  /** Byte budget for the same leak: [[maxArmed]] bounds entry COUNT,
    * but 64 armed multi-GB relations under an RDD-API caller would
    * still hoard executor memory/disk. Sizes are the optimizer's
    * pre-materialization `stats.sizeInBytes` ESTIMATE (the relation is
    * armed before it is computed, so actual block sizes don't exist
    * yet) — a bound heuristic, not an accounting invariant. The
    * newest entry is always kept: the caller's action is about to read
    * it, and unpersisting scratch early costs a recompute, never
    * correctness. Override with -Dgraft.scratch.maxBytes=N. */
  val maxArmedBytes: Long =
    java.lang.Long.getLong("graft.scratch.maxBytes", 8L << 30)

  /** Persist `df` (MEMORY_AND_DISK, no-op if already persisted) as
    * operator-internal scratch and arm it for auto-unpersist after the
    * next caller action that reads it. Returns `df` for chaining. */
  def arm(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) df.persist(StorageLevel.MEMORY_AND_DISK)
    val bytes =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
        .min(BigInt(Long.MaxValue)).max(BigInt(0)).toLong
      catch { case _: Throwable => 0L }
    armed.add(Armed(df, df.queryExecution.analyzed, bytes))
    armedBytes.addAndGet(bytes)
    while (armed.size > maxArmed ||
           (armedBytes.get > maxArmedBytes && armed.size > 1)) {
      val oldest = armed.poll()
      if (oldest != null) {
        armedBytes.addAndGet(-oldest.bytes)
        if (oldest.df.storageLevel != StorageLevel.NONE) {
          try oldest.df.unpersist(blocking = false)
          catch { case _: Throwable => () }
        }
      }
    }
    val spark = df.sparkSession
    if (sessions.put(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = sweep(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = sweep(qe)
      })
    df
  }

  private def sweep(qe: QueryExecution): Unit = {
    val it = armed.iterator()
    while (it.hasNext) {
      val entry = it.next()
      val dead = entry.df.storageLevel == StorageLevel.NONE
      val referenced = dead || {
        try qe.analyzed.collectFirst {
          case p if p.sameResult(entry.plan) => ()
        }.isDefined
        catch { case _: Throwable => false }
      }
      if (referenced) {
        it.remove()
        armedBytes.addAndGet(-entry.bytes)
        if (!dead) {
          // non-blocking: the sweep must not stall the listener bus
          try entry.df.unpersist(blocking = false)
          catch { case _: Throwable => () }
        }
      }
    }
  }

  /** Unpersist and forget EVERY armed entry. For plan-only workflows
    * (explain audits, plan linting, dry-run pipelines): building an
    * operator's plan arms its scratch, but no action ever runs to sweep
    * it — the count/byte bounds cap the leak, this releases it
    * entirely. Also the test-isolation hook. Safe anytime: unpersisting
    * scratch costs a recompute on next use, never correctness. */
  def drain(): Unit = {
    var e = armed.poll()
    while (e != null) {
      armedBytes.addAndGet(-e.bytes)
      if (e.df.storageLevel != StorageLevel.NONE) {
        try e.df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
      e = armed.poll()
    }
  }

  /** Test/diagnostic hook: number of armed, still-cached relations. */
  def pending: Int = {
    var n = 0
    armed.forEach(e => if (e.df.storageLevel != StorageLevel.NONE) n += 1)
    n
  }

  /** Test/diagnostic hook: estimated bytes across armed entries. */
  def pendingBytes: Long = armedBytes.get
}
