package graft.wordscore

/**
 * Striped bounded LRU memo for per-JVM executor caches.
 *
 * Replaces the clear-on-cap ConcurrentHashMap idiom: clearing the whole
 * memo on overflow causes periodic latency spikes while a Zipf workload
 * refills it from scratch; an access-ordered LRU instead evicts one
 * cold entry per overflowing insert, so the hot set survives
 * continuously. Striping (key-hash -> segment) keeps lock contention
 * low under many executor threads; each stripe is an access-ordered
 * `LinkedHashMap` behind a synchronized wrapper, evicting its own
 * eldest entry past `capacity / stripes`.
 */
private[wordscore] final class BoundedLruCache[K, V <: AnyRef](
    capacity: Int, stripes: Int = 16) {
  require(capacity >= stripes, "capacity must cover at least one per stripe")

  private val stripeCap = capacity / stripes

  private val segments: Array[java.util.Map[K, V]] =
    Array.fill(stripes)(java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
          size() > stripeCap
      }))

  private def segmentOf(key: K): java.util.Map[K, V] =
    segments((key.hashCode & 0x7fffffff) % stripes)

  /** Cached value or null; a hit refreshes the entry's recency. */
  def get(key: K): V = segmentOf(key).get(key)

  def put(key: K, value: V): Unit = segmentOf(key).put(key, value)

  def size: Int = segments.map(_.size).sum
}
