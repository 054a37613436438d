package graft.util

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

import graft.SparkTestBase

/** Concurrency contract of the snapshot memo: prepareIndexes fans
  * artifact chains out on parallel threads and artifacts NEST (an
  * outer builder forces an inner snapshot). Each key's builder must
  * run exactly once under that load — a double-build is two
  * overwrite-writes racing on one parquet path, and the original
  * computeIfAbsent formulation threw 'Recursive update' when a nested
  * build hit the map mid-resize (caught by the full suite in round 5).
  */
class SnapshotsSpec extends SparkTestBase {

  test("concurrent nested snapshot builds run each builder exactly once") {
    val dir = Files.createTempDirectory("graft_snapshots_conc").toString
    val builds = new ConcurrentHashMap[String, AtomicInteger]
    def count(name: String): AtomicInteger =
      builds.computeIfAbsent(name, _ => new AtomicInteger)

    def inner = Snapshots(spark, dir, "inner") {
      count("inner").incrementAndGet()
      spark.range(5).toDF()
    }
    def outer(i: Int) = Snapshots(spark, dir, s"outer-$i") {
      count(s"outer-$i").incrementAndGet()
      inner.count() // the nested dependency, forced mid-build
      spark.range(3).toDF()
    }

    // 16 tasks × 4 distinct outer keys, all racing on the shared inner.
    val tasks = (0 until 16).map(i => Future { outer(i % 4).count() })
    Await.result(Future.sequence(tasks), Duration.Inf)

    assert(count("inner").get == 1, s"inner built ${count("inner").get} times")
    (0 until 4).foreach { i =>
      assert(count(s"outer-$i").get == 1,
        s"outer-$i built ${count(s"outer-$i").get} times")
    }
    // And the artifacts are readable and correct after the stampede.
    assert(inner.count() == 5)
    assert(outer(0).count() == 3)
  }
}
