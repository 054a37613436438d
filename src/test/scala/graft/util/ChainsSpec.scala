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

  test("all-green chains complete silently") {
    val done = new AtomicInteger(0)
    Chains.runAll(Seq.fill(8)(() => done.incrementAndGet()))
    assert(done.get() == 8)
  }
}
