package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: runs selected queries twice (cold = builds per-corpus
  * snapshots, warm = reads them) so snapshot-build cost is separable
  * from query cost. Usage: runMain graft.Profile [sfDir] [name ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q64_fingerprint", "q65_minhash_lsh", "q67_ngram_jaccard", "q71_embedding_neardup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, label: String): Unit = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    names.foreach { n => run(n, "cold"); run(n, "warm") }
    spark.stop()
  }
}
