package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Cache-scope discipline for multi-consumer intermediates (SCALE.md
  * "Unpersist discipline", VERDICT r04 "What's wrong" #2).
  *
  * Operators like the PPJoin self-join persist a per-doc frame because
  * the SAME query plan consumes it several times (both candidate
  * sides, both verify sides). The frame is only useful while that one
  * terminal action runs — but the operator returns a lazy DataFrame,
  * so it cannot unpersist before the caller's action, and a bare
  * `.persist` leaks MEMORY_AND_DISK blocks into any long-lived session
  * that doesn't run `clearCache()` itself.
  *
  * [[withPersisted]] closes that hole: persist, build the result, and
  * register a [[QueryExecutionListener]] that unpersists the frame
  * after the FIRST action (success or failure) whose analyzed plan
  * contains the cached subtree — i.e. exactly when the fan-out it paid
  * for has happened. The listener then unregisters itself, so the
  * session keeps no residue. If the caller never executes the result
  * (e.g. explain-only), the behavior degrades to today's contract:
  * blocks stay until `clearCache()`/session end.
  *
  * A second action on the same result recomputes without the cache —
  * the right default for a library: correctness is unchanged, and a
  * caller that wants cross-action reuse can persist the RESULT itself,
  * whose lifetime it owns.
  */
object Caching {

  /** Persist `toCache` for the duration of the first execution of the
    * frame `build` derives from it, then release it.
    */
  def withPersisted(toCache: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    toCache.persist(StorageLevel.MEMORY_AND_DISK)
    val result = build(toCache)
    release(toCache, toCache.queryExecution.analyzed)
    result
  }

  /** Like [[withPersisted]], but `build` MAY run its own actions on
    * frames derived from the cached one (e.g. a verify-strategy probe
    * that counts the batch vocabulary before choosing a kernel): the
    * release is scoped to the first action containing the RESULT's
    * plan, so the internal actions reuse the cache instead of
    * releasing it.
    */
  def withPersistedThrough(toCache: DataFrame)
      (build: DataFrame => DataFrame): DataFrame = {
    toCache.persist(StorageLevel.MEMORY_AND_DISK)
    val result = build(toCache)
    release(toCache, result.queryExecution.analyzed)
    result
  }

  /** Unpersist `toCache` after the first action whose analyzed plan
    * contains `scopePlan` as a subtree.
    */
  private def release(toCache: DataFrame,
      scopePlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit = {
    val spark = toCache.sparkSession
    val cachedPlan = scopePlan
    val released = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        // the action's analyzed plan (pre-cache-substitution) contains
        // the persisted frame's plan as a subtree iff this action is
        // the one the persist was scoped to
        val usesCached =
          try qe.analyzed.exists(_.sameResult(cachedPlan))
          catch { case _: Throwable => false }
        if (usesCached && released.compareAndSet(false, true)) {
          toCache.unpersist(blocking = false)
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
  }
}
