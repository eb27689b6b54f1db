package graft.adhesive

/** Bounded access-ordered LRU over `java.util.LinkedHashMap` — backs the
  * DDL-time compile cache. At capacity the least-recently-USED entry is
  * evicted (both hits and inserts refresh recency), so the hot entries a
  * cache exists to serve (benchmark loops, session re-init re-running the
  * same DDL) survive pressure from a stream of one-off registrations.
  *
  * Coarse-grained synchronization: `getOrCompute` holds the lock across
  * the compute, so concurrent DDL for the same source compiles once.
  * DDL is a driver-side, human-rate operation — contention is not a
  * concern, single-compile semantics are.
  */
private[adhesive] final class LruCache[K, V](cap: Int) {
  require(cap > 0, s"cache capacity must be positive: $cap")

  private val map =
    new java.util.LinkedHashMap[K, V](16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        this.size() > cap
    }

  def size: Int = synchronized(map.size)

  def contains(key: K): Boolean = synchronized(map.containsKey(key))

  def getOrCompute(key: K)(compute: => V): V = synchronized {
    val hit = map.get(key) // get() refreshes LRU order
    if (hit != null) hit
    else { val v = compute; map.put(key, v); v }
  }
}
