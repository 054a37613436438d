package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r21 experiment #3: attribute PLANNING cost (which rivals
  * execution on the multi-join queries) — per-rule optimizer time via
  * RuleExecutor's global metrics, plus the cost of relation creation
  * (spark.read.parquet per call: listing + footer schema read).
  * Usage: runMain graft.ScanLab <sfDir> [query ...]
  */
object ScanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (a) relation-creation cost: spark.read.parquet called repeatedly
    Seq("lineitem", "orders", "documents").foreach { t =>
      val secs = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val df = graft.util.Tables.tbl(spark, sfDir, t)
        df.schema // force analysis of the relation
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[lab] relation $t%-10s min=${secs.min}%.4f all=${secs.map(s => f"$s%.4f").mkString(",")}")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q134_tpch_q8", "q111_ivfpq_ann", "q132_label_noise_knn")
    SparkEntry.prepareIndexes(spark, sfDir)

    import org.apache.spark.sql.catalyst.rules.RuleExecutor
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      noop(fn(spark, sfDir)) // warm
      RuleExecutor.resetMetrics()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      println(f"[lab] $n plan=${(t1 - t0) / 1e9}%.3f s; top rules:")
      val dump = RuleExecutor.dumpTimeSpent()
      dump.split('\n')
        .filter(_.contains(" "))
        .flatMap { line =>
          val parts = line.trim.split("\\s+")
          if (parts.length >= 2)
            scala.util.Try((parts(0), parts(1).toDouble)).toOption
          else None
        }
        .sortBy(-_._2)
        .take(18)
        .foreach { case (rule, ns) =>
          if (ns > 1e6) println(f"[lab]   ${ns / 1e6}%8.1f ms  $rule")
        }
    }
    spark.stop()
  }
}
