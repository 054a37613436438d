package graft

import org.apache.spark.sql.SparkSession

/** Dev audit: for every declared query, count parquet scan nodes and
  * hash exchanges in the optimized physical plan at sf0.001. A
  * documents-only query with 3+ scans is usually the multi-branch
  * lineage problem (exchange reuse does not fire across differently-
  * projected branches — see q105's history), i.e. a plan that reads
  * the 100 TB corpus more than once. The initial plan OVERCOUNTS for
  * canonically-equal subtrees (self-joins): AQE reuses those stages at
  * runtime, so pass `exec` to execute each query (noop sink) and count
  * ReusedExchange / table-cache hits in the final adaptive plan — that
  * is the number that matters. Usage:
  * runMain graft.PlanAudit [sfDir] [minScans] [exec]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minScans = if (args.length > 1) args(1).toInt else 2
    val spark = graft.util.Tables.withSessionConf(
      SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", 4)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exec = args.contains("exec")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (exec) df.write.format("noop").mode("overwrite").save()
        val qe = df.queryExecution
        val p =
          if (exec) qe.executedPlan.toString // post-AQE: final stages, reuse visible
          else qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val lines = p.linesIterator.toSeq
        def nodes(s: String) =
          if (exec) lines.count(_.contains(s))
          else lines.count(l => l.trim.startsWith("(") && l.contains(s))
        val scans = nodes("Scan parquet")
        val reused = nodes("ReusedExchange") + nodes("ReusedQueryStage")
        val exchanges = lines.count(_.contains("hashpartitioning"))
        // Same-table re-scans are the signal that matters at 100 TB: a
        // query planning N scans of the SAME source reads the corpus N
        // times. Scans of N different tables are just a join tree.
        val tableRe = "file:[^\\]\\,]*/([A-Za-z0-9_.-]+)\\.parquet".r
        val perTable = lines
          .filter(_.contains("Scan parquet"))
          .flatMap(l => tableRe.findFirstMatchIn(l).map(_.group(1)))
          .groupBy(identity).view.mapValues(_.size)
          .filter(_._2 >= 2).toMap
        if (scans >= minScans || perTable.nonEmpty) {
          val dup = perTable.toSeq.sortBy(-_._2)
            .map { case (t, n) => s"$t×$n" }.mkString(",")
          println(f"[audit] $name%-35s scans=$scans exch=$exchanges reused=$reused dup=[$dup]")
          // For each duplicated table, show what each scan actually
          // reads: N cheap key-column scans are fine; N scans that all
          // deserialize `text` re-read the corpus payload N times.
          val schemaRe = "ReadSchema: struct<([^>]*)".r
          lines.filter(_.contains("Scan parquet")).foreach { l =>
            for {
              t <- tableRe.findFirstMatchIn(l).map(_.group(1))
              if perTable.contains(t)
              s <- schemaRe.findFirstMatchIn(l).map(_.group(1))
            } println(s"         $t <- ${s.split(",").map(_.takeWhile(_ != ':')).mkString(",")}")
          }
        }
      } catch {
        case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
