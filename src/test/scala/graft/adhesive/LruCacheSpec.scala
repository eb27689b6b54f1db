package graft.adhesive

import org.scalatest.funsuite.AnyFunSuite

/** The property the compile cache's LRU exists for: a hot entry (touched
  * between one-off insertions) survives cap pressure; cold entries are
  * the ones evicted. The previous clear-at-cap scheme dropped the hot
  * entry with everything else.
  */
class LruCacheSpec extends AnyFunSuite {

  test("hot entry survives cap pressure; eviction is least-recently-used") {
    val c = new LruCache[String, Int](3)
    var compiles = 0
    def get(k: String): Int = c.getOrCompute(k) { compiles += 1; compiles }

    get("hot"); get("a"); get("b")
    assert(c.size == 3 && compiles == 3)

    // Touch the hot entry, then push two one-offs through the cap.
    get("hot")
    get("c") // evicts "a" (LRU), not "hot"
    get("d") // evicts "b"
    assert(c.size == 3)
    assert(c.contains("hot") && c.contains("c") && c.contains("d"))
    assert(!c.contains("a") && !c.contains("b"))

    // The surviving hot entry is served from cache, not recomputed.
    val before = compiles
    get("hot")
    assert(compiles == before, "hot hit must not recompute")
  }

  test("getOrCompute computes once per key and caches the value") {
    val c = new LruCache[Int, String](8)
    var n = 0
    def get(k: Int): String = c.getOrCompute(k) { n += 1; s"v$k" }
    assert(get(1) == "v1" && get(1) == "v1" && n == 1)
    assert(get(2) == "v2" && n == 2)
  }
}
