package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway r21 microbench: isolate the ~140 ms/task fixed CPU cost
  * observed on shuffle-consuming stages of the full queries. Runs a
  * family of synthetic shapes twice (second run measured) and prints
  * per-stage task/cpu totals.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.shuffle.sort.bypassMergeThreshold",
          sys.env.getOrElse("GRAFT_BYPASS_THRESH", "200"))
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        rows.add((si.stageId, si.name.takeWhile(_ != '\n').take(40), si.numTasks,
          si.taskMetrics.executorRunTime, si.taskMetrics.executorCpuTime / 1000000L))
      }
    })

    def measure(name: String)(f: => Unit): Unit = {
      f // warm
      rows.clear()
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      println(f"[micro] $name $sec%.3f s")
      rows.asScala.toSeq.sortBy(-_._4).take(4).foreach { case (id, n, t, run, cpu) =>
        println(f"[micro]   s$id $t%3d tasks run=$run%6d cpu=$cpu%6d  $n")
      }
    }

    val base = spark.range(100000).select(
      (col("id") % 1000).as("k"), col("id").as("v"),
      (col("id") % 7).cast("double").as("d"))

    measure("hashagg-32part")(
      base.groupBy("k").agg(sum("v"), min("d"))
        .write.format("noop").mode("overwrite").save())
    measure("hashagg+sort")(
      base.groupBy("k").agg(sum("v").as("s"), min("d").as("m"))
        .orderBy("k")
        .write.format("noop").mode("overwrite").save())
    measure("join-smj")(
      base.join(base.select(col("k").as("k2"), col("v").as("v2")),
        col("k") === col("k2"))
        .groupBy("k").count()
        .write.format("noop").mode("overwrite").save())
    measure("window")(
      base.withColumn("r",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("v")))
        .write.format("noop").mode("overwrite").save())
    // Same shapes at 1/32 the partitions: does per-task cpu stay ~flat
    // (fixed per-task cost) or scale with rows (real row work)?
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    measure("hashagg-4part")(
      base.groupBy("k").agg(sum("v"), min("d"))
        .write.format("noop").mode("overwrite").save())
    measure("window-4part")(
      base.withColumn("r",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy("v")))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
