package graft.engine

import graft.sources.TableResolver

/** TTL'd layer-schema cache over a [[TableResolver]] — the reference keeps
  * detected schemas for 60 s keyed by the table's metadata location
  * (api/main.py:31-33) because [[SchemaService.describe]] runs a one-row
  * geometry probe (a Spark action) that must not execute per request.
  *
  * Entries carry the snapshot version they were detected at. Within the
  * TTL a hit is served with no filesystem or Spark work at all (the
  * reference's staleness contract: a snapshot advance becomes visible
  * within one TTL). On expiry the current version is re-checked — a cheap
  * directory listing — and the expensive probe re-runs only when the
  * version actually advanced; otherwise the entry is revalidated in place.
  *
  * The clock is injectable so tests can drive expiry deterministically.
  */
final class SchemaCache(resolver: TableResolver, ttlMillis: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(schema: FeatureSchema, version: Long,
      stampedAt: Long)

  private val cache =
    scala.collection.mutable.Map.empty[(String, String), Entry]

  /** Detected schema for `namespace.table` at its current snapshot, served
    * from cache within the TTL. */
  def describe(namespace: String, table: String): FeatureSchema =
    synchronized {
      val key = (namespace, table)
      val now = clock()
      cache.get(key) match {
        case Some(e) if now - e.stampedAt < ttlMillis => e.schema
        case stale =>
          val cur = resolver.snapshots(namespace, table).last
          stale match {
            case Some(e) if e.version == cur =>
              // version unchanged: revalidate without re-probing
              cache(key) = e.copy(stampedAt = now)
              e.schema
            case _ =>
              val schema = SchemaService.describe(
                resolver.loadAt(namespace, table, cur), s"$namespace.$table")
              cache(key) = Entry(schema, cur, now)
              schema
          }
      }
    }

  /** Drop one table's entry (e.g. after an explicit DDL). */
  def invalidate(namespace: String, table: String): Unit = synchronized {
    cache.remove((namespace, table))
  }

  /** Drop everything. */
  def invalidateAll(): Unit = synchronized { cache.clear() }
}
