package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Planned-vs-total file counts of a query's parquet scans — the
  * files-pruned evidence the scale curves cite, shared by the Profile
  * interactive readout and the bench's scale sections. The walk must
  * recurse through AQE wrappers explicitly: `QueryStageExec` holds its
  * plan as a MEMBER, not a child, so a children-only traversal stops
  * dead at every stage boundary and reports zero scans.
  */
object PlanFiles {

  /** Execute `df` (untimed — metrics live on the executed plan
    * instance) and return (files planned, files in the scanned
    * relations). "Total" counts the relations' own file listings: for
    * a driver-narrowed read (readKeyed) the admission already happened
    * before the relation was built, so callers citing a layout-wide
    * denominator should pair this with the layout's live file count.
    */
  def filesPlanned(df: DataFrame): (Long, Long) = {
    val qe = df.queryExecution
    qe.executedPlan.execute().foreachPartition(
      (_: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => ())
    val ss = scans(qe.executedPlan)
    val planned = ss.flatMap(_.metrics.get("numFiles").map(_.value)).sum
    val total = ss.map(_.relation.location.inputFiles.length.toLong).sum
    (planned, total)
  }

  private def scans(pl: SparkPlan): Seq[FileSourceScanExec] = (pl match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case sc: FileSourceScanExec => Seq(sc)
    case other => other.children.flatMap(scans)
  }) ++ pl.subqueries.flatMap(scans)
}
