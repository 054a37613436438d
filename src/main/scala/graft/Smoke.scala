package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's entry check: runs
  * SparkEntry.entry on sf0.001 and asserts rows > 0. Optional arg:
  * a query name to run + explain instead.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.headOption match {
      case Some("--time") =>
        // Focused scale measurement: --time <dir> <query...> — per
        // query, one untimed warm pass (artifact builds + JIT land
        // here, mirroring Bench's prepareIndexes split), then the min
        // of two timed noop-sink evaluations (Bench's full-evaluation
        // + min-of-2 methodology, without dragging the whole roster
        // through a ×k corpus).
        if (args.length < 3) {
          System.err.println("usage: Smoke --time <sfDir> <query> [query ...]")
          spark.stop()
          sys.exit(2)
        }
        val sfDir = args(1)
        args.drop(2).foreach { name =>
          val q = SparkEntry.queries.getOrElse(name,
            sys.error(s"unknown query '$name' — see SparkEntry.queries.keys"))
          def once(): Double = {
            val t0 = System.nanoTime()
            q(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once()
          val sec = math.min(once(), once())
          println(f"[time] $name $sec%.3f sec $sfDir")
        }
      case Some(name) =>
        val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.explain("formatted")
        df.show(20, truncate = false)
      case None =>
        val df = SparkEntry.entry(spark)
        val n = df.count()
        println(s"[smoke] entry rows=$n")
        assert(n > 0, "entry returned 0 rows")
        df.show(5, truncate = false)
    }
    spark.stop()
  }
}
