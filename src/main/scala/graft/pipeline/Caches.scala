package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Registry for the pipeline operators' internal `persist()` calls
  * (narrow signature/member maps that several plan legs read).
  *
  * A near-dup operator cannot unpersist its own caches: the returned
  * DataFrame is lazy, so the cache must outlive the call and is only
  * safe to drop after the CALLER's action. Tracking every internal
  * persist here gives sessions a one-call eviction point —
  * [[release]] after each query/request — instead of an unbounded
  * cache accumulation across a long-running serving session
  * (round-6 verdict #8). Verify/Bench release after every query;
  * serving sessions release at RequestGate drain points (the last
  * active request completing — api/RequestGate.scala).
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[release]]. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist()
    tracked.add(p)
    p
  }

  /** Unpersist every cache tracked since the last release. Safe to call
    * while other queries still hold plans over the cached data — Spark
    * recomputes from lineage — but intended at action boundaries. */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
  }
}
