package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The bounded rename pool behind LakeCommit.publish and the compaction
  * swap: original-exception propagation, no cancellation of independent
  * idempotent work, caller-thread fast path. */
class LakeCommitPoolSpec extends AnyFunSuite {

  test("foreachPar propagates the original exception; independent items still run") {
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val e = intercept[IllegalStateException] {
      LakeCommit.foreachPar((1 to 20).toSeq, parallelism = 4) { i =>
        if (i == 7) throw new IllegalStateException("boom")
        seen.add(i): Unit
      }
    }
    assert(e.getMessage === "boom") // unwrapped, not ExecutionException
    // remaining work is not cancelled (each partition op is idempotent, a
    // re-run converges) — wait out the pool's in-flight tail
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (seen.size < 19 && System.nanoTime() < deadline) Thread.sleep(20)
    assert(seen.size === 19, s"only ${seen.size} items ran")
  }

  test("foreachPar runs a single item on the caller thread") {
    val caller = Thread.currentThread().getName
    var ran: String = null
    LakeCommit.foreachPar(Seq(1)) { _ =>
      ran = Thread.currentThread().getName
    }
    assert(ran === caller)
  }

  test("foreachPar preserves all items' effects on success") {
    val sum = new java.util.concurrent.atomic.AtomicLong()
    LakeCommit.foreachPar((1L to 100L).toSeq) { i => sum.addAndGet(i): Unit }
    assert(sum.get() === 5050L)
  }
}
