package graft.util

/** Concurrent-build barrier for a module's independent artifact
  * chains — the one place the prepare fan-outs ([[graft.queries]]'
  * `prebuildIndexes`) wait on their futures.
  *
  * A bare `Await.result(Future.sequence(...))` has two failure modes
  * this helper exists to close (r18 advice):
  *
  *  - A FATAL throwable (OOM-class) escaping a `Future` body never
  *    completes its promise in Scala 2.13 — the executor thread dies
  *    and the barrier parks forever. [[SparkEntry.prepareIndexModules]]
  *    guards exactly this at the module level; the per-module chain
  *    barriers must too, or a fatal inside one chain hangs the bench
  *    instead of aborting it.
  *  - On a NonFatal chain failure `Future.sequence` fails FAST while
  *    the remaining chains keep running detached — the caller starts
  *    timing run-1 queries with orphan index builds still consuming
  *    the box.
  *
  * So every chain body catches `Throwable` (the barrier always
  * completes, and completes only after EVERY chain has finished —
  * success or failure, no detached work), and the recorded errors are
  * rethrown after it: a fatal error takes precedence as the primary
  * (the process must abort, exactly as prepareIndexModules documents),
  * with every other failure attached as suppressed so none vanishes.
  */
object Chains {

  /** Run the chains concurrently; return only when ALL have finished.
    * Throws the first fatal error if any chain died fatally, else the
    * first NonFatal failure; other failures ride along as suppressed.
    */
  def runAll(chains: Seq[() => Any]): Unit =
    runLabeled("", chains.zipWithIndex.map { case (c, i) => (s"chain-$i", c) })

  /** [[runAll]] with per-chain wall-time observability: each chain's
    * seconds go to stderr under `module/label`, so a prepare-phase
    * critical path is attributable to its CHAIN from any bench log
    * (the bench's index_build_modules stops at module granularity —
    * exactly the blind spot that made r18's similarity wall time a
    * round-long mystery). Chains overlap; the timings are not
    * additive, and the max names the critical chain.
    */
  def runLabeled(module: String, chains: Seq[(String, () => Any)]): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    Await.result(
      Future.sequence(chains.map { case (label, c) =>
        Future {
          val t0 = System.nanoTime()
          try { c(); () } catch {
            case t: InterruptedException =>
              // Cancellation is NOT absorbed: InterruptedException is
              // fatal under NonFatal, so the queue's primary-error pick
              // below rethrows it once the barrier completes. The flag
              // is deliberately NOT restored here — the chain body has
              // already returned (throwing cleared the flag), so
              // re-arming it on this SHARED global-pool worker would
              // only leak a spurious interrupt into whatever unrelated
              // future the pool schedules next on this thread,
              // misattributing the cancellation to an innocent chain.
              errs.add(t); ()
            case t: Throwable => errs.add(t); ()
          }
          finally if (module.nonEmpty) System.err.println(
            f"[graft] prepare $module/$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }),
      Duration.Inf)
    import scala.jdk.CollectionConverters._
    val all = errs.asScala.toSeq
    if (all.nonEmpty) {
      val primary = all.find(t => !scala.util.control.NonFatal(t)).getOrElse(all.head)
      all.foreach(t => if (t ne primary) primary.addSuppressed(t))
      throw primary
    }
  }
}
