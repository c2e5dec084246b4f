package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression converters.
  *
  * Spark 4 removed the public `new Column(expr)` constructor; the classic
  * (non-connect) path goes through `org.apache.spark.sql.classic.ExpressionUtils`.
  * Living under `org.apache.spark.sql.*` grants access. Used by graft's custom
  * Catalyst expressions (e.g. [[graft.functions.DotProduct]]).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the cached blocks behind a `localCheckpoint(eager = true)` frame.
    *
    * `DataFrame.unpersist` only consults the CacheManager, which never hears
    * about checkpoint blocks — the RDD caching happens inside
    * `localCheckpoint` itself — so iterative operators that checkpoint per
    * round would otherwise pin every superseded round's blocks until the
    * session dies. The checkpointed plan is a `LogicalRDD` (`private[sql]`,
    * hence this bridge); anything else is a no-op. Safe only once nothing
    * will recompute FROM the frame (downstream checkpoints are themselves
    * materialized). */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Whether a localCheckpoint-backed frame's blocks are still persisted —
    * false once something (e.g. a bench harness's per-query cleanup)
    * unpersisted the truncated-lineage RDD, after which the frame cannot be
    * recomputed and must be rebuilt from source. Non-checkpoint frames
    * report true (they always recompute). */
  def checkpointAlive(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      case _ => true
    }

  /** Probe a serialized `org.apache.spark.util.sketch.BloomFilter` with the
    * NATIVE `BloomFilterMightContain` expression (the one Spark's runtime
    * join-pruning filters use) instead of a boxed UDF. The sketch must have
    * been built over `xxhash64(key)` longs — the expression probes
    * `mightContainLong(value)` directly, so build-side and probe-side must
    * hash identically; [[graft.operators.CorpusOps.bloomDecontaminate]] owns
    * that contract. Lives here because catalyst expression construction is
    * this repo's one sanctioned internal-API touchpoint. */
  def bloomMightContain(bloomBytes: Array[Byte], hashedValue: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(bloomBytes, org.apache.spark.sql.types.BinaryType),
      expression(hashedValue)))

  /** Free EVERY localCheckpoint block pinned anywhere in `df`'s plan: walks
    * the analyzed tree and unpersists each `LogicalRDD`. The scoped sibling
    * of a bench harness's global `getPersistentRDDs` sweep — for long-lived
    * library callers whose operator pinned INTERNAL checkpoints the returned
    * frame derives from (e.g. CorpusOps' dup-span token base,
    * Dedup.sparseCosinePairs' tf frame), where [[unpersistCheckpoint]] only
    * reaches a checkpoint at the plan ROOT. After this the frame (and
    * anything else sharing those checkpoints) can no longer be recomputed —
    * call once, after the last action on the result. */
  def unpersistPlanCheckpoints(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Block until the async listener bus has dispatched every queued event (or
    * `timeoutMs` passes on a pathologically loaded box). Job-census tools must
    * call this BEFORE detaching their listener: `JobEnd` events arrive on the
    * bus thread, and a fixed sleep can undercount trailing jobs — the exact
    * number those tools exist to pin down. `listenerBus` is `private[spark]`,
    * hence this bridge. */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** One-line driver/block-manager state snapshot for bench accountability:
    * heap in use, storage memory in use, pinned RDD count, live broadcast
    * block count. The broadcast count is the interesting one — RDD blocks
    * are freed by the bench's per-query cleanup, but broadcast pieces only
    * die when the ContextCleaner collects their weak refs after a GC. */
  def benchState(sc: org.apache.spark.SparkContext): String = {
    val master = org.apache.spark.SparkEnv.get.blockManager.master
    val bcast = master
      .getMatchingBlockIds(_.isBroadcast, askStorageEndpoints = true)
      .map(_.toString.split("_piece")(0)).distinct
    val storageUsed = master.getMemoryStatus.values
      .map { case (max, rem) => max - rem }.sum
    val rt = Runtime.getRuntime
    val heapMb = (rt.totalMemory - rt.freeMemory) >> 20
    s"heapMB=$heapMb storageMB=${storageUsed >> 20} " +
      s"rdds=${sc.getPersistentRDDs.size} bcast=${bcast.size}"
  }
}
