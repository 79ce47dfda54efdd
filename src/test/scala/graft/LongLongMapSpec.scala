package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{LongHashSet, LongLongMap}

/** The CC loop's primitive open-addressed map/set vs the boxed JDK
  * reference they replaced (r21): randomized equivalence incl. growth,
  * overwrite, adversarial keys (0, ±1, Long.MinValue/MaxValue), and the
  * find/valueAt absence contract that replaced a value sentinel. */
class LongLongMapSpec extends AnyFunSuite {

  test("map matches java.util.HashMap under random insert/overwrite") {
    val rnd = new scala.util.Random(42)
    val m = new LongLongMap(4)
    val ref = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    val keys = Array(0L, -1L, 1L, Long.MinValue, Long.MaxValue) ++
      Array.fill(5000)(rnd.nextLong() % 1000)
    keys.foreach { k =>
      val v = rnd.nextLong()
      m.put(k, v); ref.put(k, v): Unit
    }
    assert(m.size === ref.size)
    val it = ref.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val s = m.find(e.getKey)
      assert(s >= 0, s"missing ${e.getKey}")
      assert(m.valueAt(s) === e.getValue.longValue())
    }
    // absent keys (incl. the would-be sentinel) report slot -1
    var probes = 0
    while (probes < 1000) {
      val k = rnd.nextLong()
      if (!ref.containsKey(k)) assert(m.find(k) === -1)
      probes += 1
    }
  }

  test("Long.MinValue is a storable key AND value (no value sentinel)") {
    val m = new LongLongMap(4)
    m.put(7L, Long.MinValue)
    m.put(Long.MinValue, 7L)
    assert(m.valueAt(m.find(7L)) === Long.MinValue)
    assert(m.valueAt(m.find(Long.MinValue)) === 7L)
    assert(m.find(8L) === -1)
  }

  test("set matches java.util.HashSet incl. add-returns-new semantics") {
    val rnd = new scala.util.Random(7)
    val s = new LongHashSet(4)
    val ref = new java.util.HashSet[java.lang.Long]()
    (0 until 8000).foreach { _ =>
      val k = rnd.nextLong() % 700
      assert(s.add(k) === ref.add(k))
    }
    assert(s.size === ref.size)
  }
}
