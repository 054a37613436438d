package graft

/** Static sanity of the plan-audit gate's configuration: every
  * documented same-source-scan allowance must name a DECLARED query —
  * a rename or roster change would otherwise leave a dangling entry
  * that silently exempts nothing (and, worse, suggests the gate still
  * covers a query it no longer sees).
  */
class PlanAuditSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("every DocumentedReuse allowance names a declared query") {
    val declared = SparkEntry.queries.keySet
    val dangling = PlanAudit.DocumentedReuse.keys.map(_._1).filterNot(declared)
    assert(dangling.isEmpty,
      s"allowances for undeclared queries (renamed? removed?): ${dangling.mkString(", ")}")
  }

  test("allowances stay at or above the gate threshold — below it they are dead entries") {
    val dead = PlanAudit.DocumentedReuse.collect {
      case ((q, src), (max, _)) if max < PlanAudit.GateMaxSameSourceScans => s"$q/$src($max)"
    }
    assert(dead.isEmpty,
      s"allowances below the gate threshold never fire: ${dead.mkString(", ")}")
  }

  test("every allowance's SOURCE is still observed by the committed audit artifact") {
    // The query-name check above catches renamed queries; this catches
    // renamed ARTIFACTS (e.g. ivf-assigned-i2 → -i3) and counts that
    // dropped below the dup threshold: either way the allowance exempts
    // nothing while suggesting coverage, so it must be updated or
    // removed alongside the change.
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("PLANAUDIT_r\\d+\\.json"))
    assume(files.nonEmpty, "no committed PLANAUDIT artifact to cross-check")
    val latest = files.maxBy(f =>
      "\\d+".r.findFirstIn(f.getName).map(_.toInt).getOrElse(0))
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(latest)
    val queries = root.get("queries")
    val stale = PlanAudit.DocumentedReuse.keys.toSeq.filter { case (q, src) =>
      val node = if (queries == null) null else queries.get(q)
      val dup = if (node == null) null else node.get("dup")
      dup == null || !dup.has(src)
    }
    assert(stale.isEmpty,
      s"allowances not observed in ${latest.getName} (artifact renamed? count dropped " +
        s"below 2?): ${stale.map { case (q, s) => s"$q/$s" }.mkString(", ")}")
  }
}
