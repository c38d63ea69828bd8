package graft.pipeline

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Pipeline-exit scoping for internally persisted hub frames.
  *
  * Composed operators ([[Dedup.dedupCorpus]], [[Dedup.ngramJaccard]],
  * [[TextAnalysis.curateCorpus]], …) persist intermediate frames because
  * their plans reference them from several branches — unpersisted, the
  * upstream pipeline replays per branch (measured ~20x for the LSH pair
  * pipeline). But the returned DataFrame is lazy: those caches cannot be
  * dropped before the CALLER's first action, so a long-lived session
  * composing many corpora would accumulate MEMORY_AND_DISK entries
  * forever.
  *
  * [[releaseAfterFirstUse]] closes that hole: it registers a one-shot
  * [[QueryExecutionListener]] that waits for the first completed action
  * whose analyzed plan CONTAINS the pipeline's result plan (an unrelated
  * query must not release the cache early), unpersists every registered
  * intermediate, and unregisters itself.
  *
  * Contract for callers that run MULTIPLE actions over a composed result:
  * persist the result (or write it out) — after the first action the
  * internal caches are gone and a second action recomputes the full
  * lineage. Bench/Verify and the one-shot curation flow run exactly one
  * action per composed query, which is the shape this is scoped for.
  */
private[graft] object CacheScope {

  /** Unpersist `cached` after the first action that consumes `result`.
    * No-op wrapper when `cached` is empty. The listener fires on success
    * AND failure (a failed job must not strand the cache), matches by
    * `sameResult` on the canonicalized subtree, and detaches after one
    * shot. Unpersisting is non-blocking.
    */
  /** Actions an unconsumed pipeline's listener observes before giving up:
    * it then releases the caches anyway (abandoned pipeline — losing the
    * cache benefit is safe, correctness is lineage-backed) and detaches,
    * so dangling listeners never accumulate plan-matching work forever.
    */
  private val AbandonAfterActions = 512

  def releaseAfterFirstUse(result: DataFrame, cached: Seq[DataFrame]): DataFrame = {
    if (cached.isEmpty) return result
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val done = new AtomicBoolean(false)
      private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
      private def fire(qe: QueryExecution): Unit = {
        val consumed =
          try qe.analyzed.find(_.sameResult(target)).isDefined
          catch { case _: Throwable => false }
        val expired = !consumed && misses.incrementAndGet() >= AbandonAfterActions
        if ((consumed || expired) && done.compareAndSet(false, true)) {
          cached.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        fire(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
