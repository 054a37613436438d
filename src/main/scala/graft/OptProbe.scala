package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev measurement harness for optimization rounds (guide §1: measure
  * first, empirically, at stage granularity). For each named query it
  *
  *   1. writes `df.explain("formatted")` to `<outDir>/<name>.txt`
  *      (the committed plans/r{N}/ evidence format),
  *   2. runs the query twice through the noop sink (pass 1 warms
  *      JIT/artifacts; pass 2 is the measured steady-state run) with a
  *      stage listener attached, and
  *   3. prints a per-stage table for the measured run — wall time,
  *      summed task time, executor CPU, input bytes, shuffle
  *      read/write bytes, task count — so the dominant stage and its
  *      cost class (compute vs fetch vs scheduling) is attributable
  *      without the UI (spark.ui is disabled in every bench session).
  *
  * Usage: runMain graft.OptProbe <sfDir> <outDir> <query> [query ...]
  * Stage rows print to stdout prefixed `[stage]`; totals `[probe]`.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: OptProbe <sfDir> <outDir> <query> [query ...]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failed = SparkEntry.prepareIndexes(spark, sfDir)
    if (failed.nonEmpty) System.err.println(s"[probe] prepare FAILED: $failed")

    // Stage listener: collects (stageId, name, metrics) rows. Cleared
    // between passes so pass-2 rows are exactly the measured run's.
    final case class StageRow(
        id: Int, name: String, tasks: Int, wallMs: Long, taskMs: Long,
        cpuMs: Long, inputMB: Double, shReadMB: Double, shWriteMB: Double,
        spillMB: Double)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]
    // Per-task (stageId, runMs, cpuMs, deserMs, gcMs) rows — the
    // distribution separates "one task compiles / works, rest wait"
    // from "every task pays a fixed cost".
    val taskRows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long, Long)]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskRows.add((te.stageId, m.executorRunTime,
          m.executorCpuTime / 1000000L, m.executorDeserializeTime, m.jvmGCTime))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        rows.add(StageRow(
          si.stageId,
          si.name.takeWhile(_ != '\n').take(90),
          si.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.remoteBytesRead / 1e6 +
            m.shuffleReadMetrics.localBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.drop(2).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      // Plan evidence file (the committed before/after format).
      val df = fn(spark, sfDir)
      val plan = {
        val out = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
        out.toString("UTF-8")
      }
      java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))

      def pass(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(s"probe:$name warm")
      val warmSec = pass()
      rows.clear()
      taskRows.clear()
      spark.sparkContext.setJobDescription(s"probe:$name measured")
      val sec = pass()
      // Listener events are posted asynchronously; a short sleep lets
      // the bus drain (listenerBus is private[spark]; stage-completed
      // events for a finished job arrive within milliseconds).
      Thread.sleep(400)
      spark.sparkContext.setJobDescription(null)
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(-_.taskMs)
      println(f"[probe] $name measured=$sec%.3f s (warm pass $warmSec%.3f s), ${rs.size} stages")
      import scala.jdk.CollectionConverters.{IterableHasAsScala => _, _}
      val byStage = taskRows.asScala.toSeq.groupBy(_._1)
      rs.foreach { r =>
        println(f"[stage] ${r.taskMs}%7d taskMs ${r.cpuMs}%7d cpuMs " +
          f"${r.wallMs}%6d wallMs ${r.tasks}%4d tasks " +
          f"${r.inputMB}%8.1f inMB ${r.shReadMB}%7.2f shrMB ${r.shWriteMB}%7.2f shwMB " +
          f"${r.spillMB}%6.1f spillMB  s${r.id} ${r.name}")
        byStage.get(r.id).filter(_ => r.taskMs > 200).foreach { ts =>
          val run = ts.map(_._2).sorted
          val cpu = ts.map(_._3).sorted
          val gc = ts.map(_._5).sum
          val deser = ts.map(_._4).sum
          def pct(xs: Seq[Long], p: Double) = xs((p * (xs.size - 1)).toInt)
          println(f"[tasks]   s${r.id} run(min/med/max)=${pct(run, 0)}/${pct(run, 0.5)}/${pct(run, 1.0)} " +
            f"cpu=${pct(cpu, 0)}/${pct(cpu, 0.5)}/${pct(cpu, 1.0)} gcSum=$gc deserSum=$deser")
        }
      }
    }
    spark.stop()
  }
}
