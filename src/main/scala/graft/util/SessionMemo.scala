package graft.util

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive shared subplans (IVF cell ranks,
  * dedup connected components).
  *
  * Keyed on the live session OBJECT via a weak-keyed identity map — so
  * (unlike a raw identity hash) a recycled hash after GC can never hand
  * a new session a DataFrame bound to a stopped one. Memoized
  * DataFrames strongly reference their session, which would normally pin
  * a weak key forever; every access therefore purges entries whose
  * SparkContext is stopped, dropping those value→key references, so
  * long-lived JVMs running many sessions (e.g. the test suite) do not
  * accumulate dead plans or checkpoint references.
  */
object SessionMemo {

  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, AnyRef]]())

  private def stopped(s: SparkSession): Boolean =
    try s.sparkContext.isStopped catch { case _: Throwable => true }

  /** Compute-once per (session, tag); recomputes after the owning
    * session stops. The map stays tiny (a handful of live entries), so
    * the purge sweep on every call is free.
    *
    * REENTRANT: a memoized computation may itself getOrCompute a
    * sub-plan (dedupGroups → dedupEdges). That forbids
    * `computeIfAbsent(tag, f)` — a recursive mutation inside an
    * in-flight computeIfAbsent on the same HashMap throws
    * ConcurrentModificationException — so the body is a plain get/put
    * under the (thread-reentrant) monitor.
    */
  def getOrCompute[V <: AnyRef](s: SparkSession, tag: String)(f: => V): V =
    memo.synchronized {
      memo.entrySet().removeIf(e => stopped(e.getKey))
      val inner = memo.computeIfAbsent(s, _ => new java.util.HashMap[String, AnyRef]())
      val got = inner.get(tag)
      if (got != null) got.asInstanceOf[V]
      else {
        val v = f
        inner.put(tag, v)
        v
      }
    }
}
