package graft

import java.util.concurrent.atomic.AtomicInteger

/** Fault isolation of the prebuild fan-out. In round 8 one module's
  * loader exception propagated through a bare Future.sequence and
  * aborted ALL four modules' prebuilds — index_build_sec collapsed and
  * run-1 query timings silently absorbed 6+ s of artifact builds. The
  * contract now: a module that throws degrades that one family and is
  * REPORTED; every other module's prebuild still runs to completion.
  */
class PrepareIndexesSpec extends SparkTestBase {

  test("a poisoned module degrades alone; the other modules still prebuild") {
    val built = new AtomicInteger(0)
    val failed = SparkEntry.prepareIndexModules(spark, "/nonexistent", Seq(
      "ok-a" -> (() => { built.incrementAndGet(); () }),
      "poisoned" -> (() => throw new IllegalStateException(
        "simulated: corpus table in an unreadable encoding")),
      "ok-b" -> (() => { built.incrementAndGet(); () }),
      "ok-c" -> (() => { built.incrementAndGet(); () }),
    ))
    assert(built.get() == 3, "healthy modules must all prebuild")
    assert(failed == Seq("poisoned"), s"failure must be isolated+reported: $failed")
  }

  test("fatal errors propagate after the barrier (neither swallowed nor hanging Await)") {
    // A fatal throwable escaping a Future body never completes its
    // promise (the thread dies; Await parks forever) — the isolation
    // layer must catch it to keep the barrier live, then rethrow.
    val built = new AtomicInteger(0)
    val e = intercept[OutOfMemoryError] {
      SparkEntry.prepareIndexModules(spark, "/nonexistent", Seq(
        "fatal" -> (() => throw new OutOfMemoryError("simulated")),
        "ok" -> (() => { built.incrementAndGet(); () }),
      ))
    }
    assert(e.getMessage == "simulated")
    assert(built.get() == 1, "the healthy module still prebuilds before the rethrow")
  }
}
