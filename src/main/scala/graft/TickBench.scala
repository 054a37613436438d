package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the maintenance-tick cost of the Z-clustered events log
  * at a given corpus size — the `maintainClustered` half of the scale
  * curve (BASELINE.md round-17 section). Appends a ~1 % synthetic
  * batch (the log's own rows, time-shifted past the high-water mark)
  * and times the newcomers-only re-cluster tick.
  *
  * Runs against a THROWAWAY COPY of the at-rest z-log root: the
  * memoized artifact is shared by every later session on the same
  * corpus fingerprint, so mutating it here would poison q153's
  * correctness gate with synthetic rows. The copy is deleted on exit.
  *
  * Usage: runMain graft.TickBench [sfDir]
  * Prints one line:
  *   {"metric":"tick","sf":…,"batch_rows":…,"append_sec":…,
  *    "tick_sec":…,"files_before":…,"files_after":…}
  */
object TickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = graft.queries.Events.eventsZLog(spark, sfDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(src).getFileSystem(conf)
    val root = src + "-tickprobe"
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(root), false, conf)
    try {
      val log = graft.util.ManifestLog.read(spark, root)
      val hwm = log.agg(max("ts_us")).head().getLong(0)
      // ~1 % of the corpus, shifted wholly past the high-water mark so
      // the appended file is a genuine newcomer segment.
      val batch = log.where(col("user_id") % 97 === 0)
        .withColumn("ts_us", col("ts_us") + lit(hwm + 1L))
        .repartitionByRange(1, col("ts_us"))
        .sortWithinPartitions("ts_us")
      val nBatch = batch.count()
      val before = graft.util.ManifestLog.liveFileCount(spark, root)
      val tA = System.nanoTime()
      graft.util.ManifestLog.appendSorted(batch, root, Nil, Some("ts_us"))
      val appendSec = (System.nanoTime() - tA) / 1e9
      val tT = System.nanoTime()
      val ticked = graft.util.ManifestLog.maintainClustered(
        spark, root, Seq("ts_us", "user_id"),
        targetFileRows = 4096L, minNewFiles = 1)
      val tickSec = (System.nanoTime() - tT) / 1e9
      require(ticked, "tick found no newcomers — probe batch never landed")
      val after = graft.util.ManifestLog.liveFileCount(spark, root)
      println(
        f"""{"metric":"tick","sf":"$sfDir","batch_rows":$nBatch,""" +
          f""""append_sec":$appendSec%.2f,"tick_sec":$tickSec%.2f,""" +
          s""""files_before":$before,"files_after":$after}""")
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      spark.stop()
    }
  }
}
