package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: run ONLY the prepare phase (every module's at-rest
  * artifact fan-out) on a fresh JVM and print the per-module wall
  * seconds — the per-CHAIN breakdown arrives on stderr from
  * [[graft.util.Chains.runLabeled]]. This is how a prepare-phase
  * critical path is attributed without paying a full bench run.
  *
  * Usage: runMain graft.Prep [sfDir] [module ...]
  */
object Prep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val modules = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val failed =
      if (modules.isEmpty) SparkEntry.prepareIndexes(spark, sfDir)
      else SparkEntry.prepareIndexes(spark, sfDir, modules)
    val total = (System.nanoTime() - t0) / 1e9
    val mods = SparkEntry.lastModuleSeconds.toSeq.sortBy(-_._2)
      .map { case (m, t) => f"$m=$t%.2f" }.mkString(",")
    println(f"[prep] total $total%.2f s failed=${failed.mkString(",")} modules{$mods}")
    spark.stop()
  }
}
