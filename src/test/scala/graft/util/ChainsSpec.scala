package graft.util

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the chain barrier behind the modules' prebuild
  * fan-outs (r18 advice): the barrier must complete even when a chain
  * dies FATALLY (a bare Future.sequence would park forever — the
  * promise is never completed), must not leave failed-fast siblings
  * running detached, and must rethrow with fatal errors taking
  * precedence and nothing swallowed.
  */
class ChainsSpec extends AnyFunSuite {

  test("all chains run; a NonFatal failure rethrows AFTER every chain finished") {
    val done = new AtomicInteger(0)
    val slowDone = new AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Chains.runAll(Seq(
        () => done.incrementAndGet(),
        () => throw new IllegalStateException("broken chain"),
        // The slow sibling: with a fail-fast barrier this would still
        // be running, detached, when runAll returns.
        () => { Thread.sleep(300); slowDone.incrementAndGet() },
      ))
    }
    assert(e.getMessage == "broken chain")
    assert(done.get() == 1)
    assert(slowDone.get() == 1,
      "barrier returned while a sibling chain was still running detached")
  }

  test("a fatal error neither hangs the barrier nor hides behind a NonFatal one") {
    val done = new AtomicInteger(0)
    val e = intercept[OutOfMemoryError] {
      Chains.runAll(Seq(
        () => throw new IllegalStateException("nonfatal, must ride as suppressed"),
        () => throw new OutOfMemoryError("simulated"),
        () => done.incrementAndGet(),
      ))
    }
    assert(e.getMessage == "simulated")
    assert(done.get() == 1)
    assert(e.getSuppressed.exists(_.getMessage.contains("nonfatal")),
      "sibling failure vanished instead of riding as suppressed")
  }

  test("an interrupted chain rethrows after the barrier without leaking the flag") {
    val done = new AtomicInteger(0)
    val e = intercept[InterruptedException] {
      Chains.runAll(Seq(
        () => throw new InterruptedException("cancelled chain"),
        () => done.incrementAndGet(),
      ))
    }
    assert(e.getMessage == "cancelled chain")
    assert(done.get() == 1, "cancellation must not strand the sibling")
    // The old code re-armed the pooled worker's interrupt flag AFTER the
    // chain body had already returned; the pool then fed that thread to
    // the next unrelated future, whose first blocking call died with a
    // spurious InterruptedException. Drill: a follow-up barrier of
    // blocking chains (wide enough to reuse the poisoned worker) must
    // complete cleanly.
    val later = new AtomicInteger(0)
    Chains.runAll(Seq.fill(32)(() => { Thread.sleep(10); later.incrementAndGet() }))
    assert(later.get() == 32,
      "a later barrier saw the interrupt flag leaked by the earlier one")
  }

  test("all-green chains complete silently") {
    val done = new AtomicInteger(0)
    Chains.runAll(Seq.fill(8)(() => done.incrementAndGet()))
    assert(done.get() == 8)
  }
}
