package graft.api

import java.util.concurrent.Semaphore
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** Serving-layer concurrency policy: bounded admission + fair-scheduler
  * pool tagging (SURVEY §4; the reference bounds all query work with a
  * 4-connection DuckDB pool, api/main.py:112-143 — this is the Spark
  * equivalent).
  *
  * At most `maxConcurrent` queries execute at once; excess requests WAIT
  * on a FAIR (FIFO) semaphore — arrival order is admission order, so no
  * request starves behind a stream of newcomers. Each admitted request
  * runs with `spark.scheduler.pool` set to its request class
  * (thread-local, so concurrent requests don't clobber each other); with
  * `spark.scheduler.mode=FAIR` on the session the scheduler then shares
  * executor slots across classes (e.g. `interactive` vs `bulk`) instead
  * of FIFO-queueing whole jobs. Under default FIFO mode the gate still
  * provides admission control — pool tags are simply inert.
  *
  * On a real cluster this is the knob that keeps one tenant's table scan
  * from head-of-line-blocking everyone's 50-row pages: admission bounds
  * driver/JVM pressure (plans, collected pages), the FAIR pools bound
  * executor-slot monopolization.
  */
final class RequestGate(maxConcurrent: Int = 4) {
  require(maxConcurrent > 0, "maxConcurrent must be positive")
  private val permits = new Semaphore(maxConcurrent, /*fair=*/ true)
  private val active = new AtomicInteger(0)
  private val peakSeen = new AtomicInteger(0)

  /** Requests currently executing (monitoring). */
  def activeCount: Int = active.get()

  /** Highest concurrent admission observed since construction. */
  def peak: Int = peakSeen.get()

  /** Requests blocked waiting for admission right now. */
  def queued: Int = permits.getQueueLength

  /** Run `body` once admitted, tagged with the `pool` request class. */
  def run[T](spark: SparkSession, pool: String = "default")(body: => T): T = {
    permits.acquire()
    val n = active.incrementAndGet()
    peakSeen.getAndUpdate(p => math.max(p, n))
    val sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", pool)
    // request-scoped cache generation: tracked persists registered by
    // this request are protected from size-bound eviction while it runs,
    // as long as a completed request's cache can be evicted instead
    // (round-8 verdict #8 — pipeline/Caches.scala)
    try graft.pipeline.Caches.withGeneration(body)
    finally {
      sc.setLocalProperty("spark.scheduler.pool", null)
      // evict the pipeline operators' tracked persists at DRAIN points
      // (last active request completing): bounded cache accumulation for
      // a serving session without evicting under a concurrently running
      // request's feet in the common case (release is safe either way —
      // Spark recomputes from lineage). A busy session that NEVER drains
      // (continuously overlapping requests) is still bounded: Caches
      // itself evicts FIFO past Caches.maxTracked registrations
      // (round-7 verdict #4 — drain points alone starve under load).
      if (active.decrementAndGet() == 0) graft.pipeline.Caches.release()
      permits.release()
    }
  }
}
